"""Layout detection models: PicoDet-style dense detector and RT-DETR.

Counterparts of the reference's ScaleAwareDetectorModel / PicoDet /
PP-DocLayout aliases (oar-ocr-core/src/models/detection/
scale_aware_detector.rs:142-422, picodet.rs:34, pp_doclayout.rs:34) and
RTDetrModel (rtdetr.rs:77-241), which execute opaque ONNX graphs with
NMS/topk baked in. Here both are explicit flax modules whose preprocess
(fixed-size resize + normalize via the fused sampler), forward, and
candidate selection (device top-k + fixed-size NMS for PicoDet, direct
top-k for RT-DETR) compile into ONE program per variant; the host receives
(max_det, 6) arrays.

PicoDet head uses GFL distribution regression (reg_max bins, integral
decode) over CSP-PAN levels — the deployed topology. RT-DETR variants run
the exact deploy topology (PPHGNetV2 + HybridEncoder + multi-scale
deformable decoder, rtdetr.py) with DETRPostProcess top-k semantics —
golden-parity-tested against tools/torch_ref_rtdetr.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...domain.layout import LAYOUT_VARIANTS, LayoutBox, LayoutVariant
from ...ops.nms import nms_fixed, topk_candidates
from ...ops.warp import NormSpec, resize_matrix, sample_transform
from ...runtime.runtime import Runtime, init_params, init_params_fast
from ...utils.tracing import stage_timer
from ..backbones import PPLCNetV3
from ..layers import ConvBNAct, DepthSepConv
from .rtdetr import RTDETRExact, rtdetr_postprocess


class CSPPAN(nn.Module):
    """Light PAN neck over 4 backbone levels (PicoDet neck)."""

    out_channels: int = 96

    @nn.compact
    def __call__(self, feats):
        oc = self.out_channels
        # lateral 1x1
        lats = [ConvBNAct(oc, (1, 1), act="hswish")(f) for f in feats]
        # top-down (resize to the exact lateral shape — odd-sized levels
        # appear for inputs not divisible by 64, e.g. 480 → 15 → 8)
        p = [None] * len(lats)
        p[-1] = lats[-1]
        for i in range(len(lats) - 2, -1, -1):
            up = jax.image.resize(p[i + 1], lats[i].shape, method="nearest")
            p[i] = DepthSepConv(oc, 3)(lats[i] + up)
        # bottom-up
        n = [None] * len(p)
        n[0] = p[0]
        for i in range(1, len(p)):
            down = ConvBNAct(oc, (3, 3), (2, 2), act="hswish")(n[i - 1])
            n[i] = DepthSepConv(oc, 3)(p[i] + down)
        return n


class PicoDetHead(nn.Module):
    """Shared depthwise head per level: class scores + GFL reg bins."""

    num_classes: int
    reg_max: int = 7
    width: int = 96

    @nn.compact
    def __call__(self, feats):
        cls_outs, reg_outs = [], []
        # shared conv stacks (applied per level with shared params)
        cls_conv1 = DepthSepConv(self.width, 5)
        cls_conv2 = DepthSepConv(self.width, 5)
        head_cls = nn.Conv(self.num_classes, (1, 1), dtype=feats[0].dtype)
        head_reg = nn.Conv(4 * (self.reg_max + 1), (1, 1),
                           dtype=feats[0].dtype)
        for f in feats:
            h = cls_conv2(cls_conv1(f))
            cls_outs.append(head_cls(h))
            reg_outs.append(head_reg(h))
        return cls_outs, reg_outs


class PicoDetModel(nn.Module):
    """Full PicoDet: backbone → CSP-PAN → head → decoded (A, C) scores and
    (A, 4) xyxy boxes in input-image pixels."""

    num_classes: int
    backbone_scale: float = 0.75
    reg_max: int = 7
    strides: Tuple[int, ...] = (8, 16, 32, 64)

    @nn.compact
    def __call__(self, x):
        c2, c3, c4, c5 = PPLCNetV3(scale=self.backbone_scale, mode="det")(x)
        # PicoDet uses strides 8..64: downsample c5 once more for the extra level
        c6 = ConvBNAct(c5.shape[-1], (3, 3), (2, 2), act="hswish")(c5)
        feats = CSPPAN()( [c3, c4, c5, c6] )
        cls_outs, reg_outs = PicoDetHead(self.num_classes, self.reg_max)(feats)

        all_scores, all_boxes = [], []
        for level, (cls, reg) in enumerate(zip(cls_outs, reg_outs)):
            b, h, w, _ = cls.shape
            stride = self.strides[level]
            scores = jax.nn.sigmoid(cls.astype(jnp.float32)).reshape(
                b, h * w, self.num_classes)
            reg = reg.astype(jnp.float32).reshape(
                b, h * w, 4, self.reg_max + 1)
            bins = jnp.arange(self.reg_max + 1, dtype=jnp.float32)
            ltrb = jnp.sum(jax.nn.softmax(reg, axis=-1) * bins, -1) * stride
            cx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
            cy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
            gx, gy = jnp.meshgrid(cx, cy)
            centers = jnp.stack([gx, gy], -1).reshape(1, h * w, 2)
            boxes = jnp.concatenate(
                [centers - ltrb[..., 0:2], centers + ltrb[..., 2:4]], -1)
            all_scores.append(scores)
            all_boxes.append(boxes * jnp.ones((b, 1, 1), jnp.float32))
        return (jnp.concatenate(all_scores, axis=1),
                jnp.concatenate(all_boxes, axis=1))


@dataclass
class LayoutDetections:
    boxes: List[LayoutBox]


class LayoutDetector:
    """Variant-dispatching layout detector (the ScaleAwareDetector/RT-DETR
    wrapper): one jitted program per variant, fixed-size outputs."""

    MAX_DET = 100
    TOPK = 400

    def __init__(self, variant: str = "pp-doclayout_plus-l", params=None, *,
                 score_thresh: float = 0.5, nms_iou: float = 0.6,
                 runtime: Optional[Runtime] = None,
                 net_overrides: Optional[dict] = None):
        self.variant: LayoutVariant = LAYOUT_VARIANTS[variant]
        self.runtime = runtime or Runtime.default()
        self.score_thresh = score_thresh
        self.nms_iou = nms_iou
        v = self.variant
        self._is_detr = v.net.startswith("rtdetr")
        if self._is_detr:
            kw = dict(num_classes=v.num_classes, arch=v.net.split("-")[1])
            kw.update(net_overrides or {})
            self.model = RTDETRExact(**kw)
            if params is None:
                params = init_params_fast(
                    self.model, (1, v.input_hw[0], v.input_hw[1], 3))
        else:
            self.model = PicoDetModel(num_classes=v.num_classes)
            if params is None:
                params = init_params(self.model,
                                     (1, v.input_hw[0], v.input_hw[1], 3))
        self.params = jax.device_put(params, self.runtime.device)
        self._step = jax.jit(self._step_impl)

    @property
    def _norm(self) -> NormSpec:
        v = self.variant
        if v.imagenet_norm:
            base = NormSpec.imagenet_rgb()
            return NormSpec(base.alpha, base.beta, swap_rb=v.bgr)
        return NormSpec(alpha=(1 / 255.0,) * 3, beta=(0.0,) * 3,
                        swap_rb=v.bgr)

    def _step_impl(self, params, pages_u8, mats, img_idx, src_hw):
        ih, iw = self.variant.input_hw
        n = mats.shape[0]
        full_w = jnp.full((n,), iw, jnp.int32)
        full_h = jnp.full((n,), ih, jnp.int32)
        x = sample_transform(pages_u8, mats, img_idx, full_w, full_h,
                             out_h=ih, out_w=iw, norm=self._norm,
                             out_dtype=self.runtime.compute_dtype)
        scores, boxes = self.model.apply(params, x)

        scale = jnp.stack([src_hw[:, 1] / iw, src_hw[:, 0] / ih,
                           src_hw[:, 1] / iw, src_hw[:, 0] / ih],
                          axis=-1).astype(jnp.float32)     # (N, 4)

        if self._is_detr:
            # DETRPostProcess semantics: sigmoid → top-k over Q·C → scale
            # normalized xyxy by the ORIGINAL page size (no NMS).
            logits = scores                      # (N, Q, C) raw logits
            top_sc, labels, xyxy = rtdetr_postprocess(
                logits, boxes, num_top=self.MAX_DET)
            src = jnp.stack([src_hw[:, 1], src_hw[:, 0],
                             src_hw[:, 1], src_hw[:, 0]],
                            axis=-1).astype(jnp.float32)   # (N, 4)
            xyxy = xyxy * src[:, None, :]
            valid = top_sc > self.score_thresh
            return xyxy, top_sc, labels, valid

        def per_image(s, bx, sc):
            cand_b, cand_s, cand_l = topk_candidates(s, bx, k=self.TOPK)
            ob, os_, ol, ov = nms_fixed(
                cand_b, cand_s, cand_l, iou_thresh=self.nms_iou,
                score_thresh=self.score_thresh, max_det=self.MAX_DET)
            return ob * sc[None, :], os_, ol, ov

        return jax.vmap(per_image)(scores, boxes, scale)

    def detect(self, pages_u8: jax.Array,
               shapes: Sequence[Tuple[int, int]],
               page_indices: Optional[Sequence[int]] = None
               ) -> List[List[LayoutBox]]:
        n = len(shapes)
        ih, iw = self.variant.input_hw
        mats = np.stack([resize_matrix(h, w, ih, iw) for h, w in shapes])
        idx = np.asarray(page_indices if page_indices is not None
                         else np.arange(n), np.int32)
        src_hw = np.asarray(shapes, np.float32)
        with stage_timer(f"layout.device[{self.variant.name}]", batch=n):
            b, s, l, v = self._step(self.params, pages_u8, jnp.asarray(mats),
                                    jnp.asarray(idx), jnp.asarray(src_hw))
            b, s, l, v = (np.asarray(b), np.asarray(s), np.asarray(l),
                          np.asarray(v))
        out: List[List[LayoutBox]] = []
        labels = self.variant.labels
        for i in range(n):
            items = []
            for j in range(b.shape[1]):
                if not v[i, j]:
                    continue
                li = int(l[i, j])
                items.append(LayoutBox(
                    label=labels[li] if 0 <= li < len(labels) else str(li),
                    score=float(s[i, j]), box=b[i, j].copy()))
            out.append(items)
        return out

"""Layout detection models: exact PicoDet and exact RT-DETR.

Counterparts of the reference's ScaleAwareDetectorModel / PicoDet /
PP-DocLayout aliases (oar-ocr-core/src/models/detection/
scale_aware_detector.rs:142-422, picodet.rs:34, pp_doclayout.rs:34) and
RTDetrModel (rtdetr.rs:77-241), which execute opaque ONNX graphs with
NMS/topk baked in. Here both are explicit flax modules whose preprocess
(fixed-size resize + normalize via the fused sampler), forward, and
candidate selection (device top-k + fixed-size NMS for PicoDet, direct
top-k for RT-DETR) compile into ONE program per variant; the host receives
(max_det, 6) arrays.

PicoDet runs the exact deploy topology (PP-LCNet v1 + CSP-PAN + PicoHead
GFL, picodet_exact.py) — golden-parity-tested against
tools/torch_ref_picodet.py. RT-DETR variants run
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
from ...runtime.runtime import Runtime, init_params_fast
from ...utils.tracing import stage_timer
from .rtdetr import RTDETRExact, rtdetr_postprocess


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
            from .picodet_exact import PicoDetExact

            scale, neck_feat, head_convs = v.picodet_dims
            kw = dict(num_classes=v.num_classes, scale=scale,
                      neck_feat=neck_feat, head_convs=head_convs)
            kw.update(net_overrides or {})
            self.model = PicoDetExact(**kw)
            if params is None:
                params = init_params_fast(
                    self.model, (1, v.input_hw[0], v.input_hw[1], 3))
        self.params = self.runtime.put_params(params)
        # mesh mode: the page-chunk batch (mats/idx/src_hw) shards over
        # ``data`` while params + the page store replicate — the same DP
        # shape as det/rec, so OARStructure's layout stage scales with
        # the OCR stages (plain jit when no mesh is active)
        self._step = self.runtime.shard_jit(self._step_impl,
                                            batch_argnums=(2, 3, 4))

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
        # pad the batch so the leading axis shards evenly over the mesh
        # (identity without a mesh — no new jit buckets single-device)
        mats, idx, src_hw = self.runtime.pad_batch(mats, idx, src_hw)
        with stage_timer(f"layout.device[{self.variant.name}]", batch=n):
            b, s, l, v = self._step(self.params, pages_u8, jnp.asarray(mats),
                                    jnp.asarray(idx), jnp.asarray(src_hw))
            b, s, l, v = (np.asarray(b)[:n], np.asarray(s)[:n],
                          np.asarray(l)[:n], np.asarray(v)[:n])
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

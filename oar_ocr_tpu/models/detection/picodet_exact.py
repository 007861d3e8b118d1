"""Exact PicoDet layout detector — the deploy checkpoint topology.

The reference drives PicoDet layout models as opaque ONNX graphs behind
``ScaleAwareDetectorModel`` (oar-ocr-core/src/models/detection/
scale_aware_detector.rs:142-439; picodet.rs:34-64 preset 800×608 BGR
1/255+ImageNet). The graphs are PaddleDetection's
``picodet_lcnet_x{s}_layout`` exports; this module re-expresses that
architecture 1:1 with flax submodule names equal to the Paddle attribute
paths, so the generic deploy-name conversion map applies:

- backbone: PP-LCNet v1 (``conv1`` + ``blocks2..6`` DepthwiseSeparable
  trunk — shared with models/recognition/slanet_exact.py), feature maps
  [3, 4, 5] = blocks4/5/6 outputs at strides 8/16/32
  (ppdet/modeling/backbones/lcnet.py);
- neck: CSP-PAN with the P6 extra level — ``conv_t.convs.{i}`` laterals,
  ``top_down_blocks``/``downsamples``/``bottom_up_blocks`` CSP layers,
  and ``first_top_conv``/``second_top_conv`` stride-2 DPModules summed
  into the stride-64 output (ppdet/modeling/necks/csp_pan.py,
  num_features=4);
- head: PicoHead with shared cls/reg branch — per-level conv stacks
  ``conv_feat.cls_conv_dw{s}.{i}`` / ``cls_conv_pw{s}.{i}``
  (ConvNormLayer 5×5-depthwise / 1×1 + hardswish) and one fused 1×1
  ``head_cls{i}`` emitting [num_classes | 4·(reg_max+1)] per level
  (ppdet/modeling/heads/pico_head.py PicoFeat share_cls_reg=True);
- decode: sigmoid scores; GFL integral (softmax over reg_max+1 bins ·
  bin index) × stride; centers at (x + cell_offset)·stride with
  cell_offset 0.5; the deploy graph's MultiClassNMS is replaced by the
  framework's fixed-size device NMS (ops/nms.py — documented redesign).

Default dims follow picodet_lcnet_x1_0_layout.yml (LCNet 1.0, CSP-PAN
128, 4 head convs, strides 8/16/32/64); variants override scale/feat.
Conversion validates dims against the real checkpoint's config at
convert time (runtime/convert_maps.py convention).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..recognition.slanet_exact import (CSPLayer, CSPConvBN, DPModule,
                                        DepthwiseSeparable, PPLCNET_V1_CONFIG,
                                        PPLCNetConvBN, _upsample_nearest,
                                        hardswish)
from ..lcnetv3 import make_divisible


class LCNetPico(nn.Module):
    """ppdet LCNet(scale, feature_maps=[3,4,5]): blocks4/5/6 outputs."""

    scale: float = 1.0

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        ch = lambda c: make_divisible(c * self.scale)
        x = PPLCNetConvBN(ch(16), 3, 2, name="conv1")(x)
        feats = []
        for stage in ("blocks2", "blocks3", "blocks4", "blocks5", "blocks6"):
            for i, (k, in_c, out_c, s, se) in enumerate(
                    PPLCNET_V1_CONFIG[stage]):
                x = DepthwiseSeparable(ch(in_c), ch(out_c), k, s, se,
                                       name=f"{stage}.{i}")(x)
            if stage in ("blocks4", "blocks5", "blocks6"):
                feats.append(x)
        return feats


class PicoCSPPAN(nn.Module):
    """csp_pan.CSPPAN with num_features=4: 3 backbone levels in, 4 out
    (the stride-64 level = first_top_conv(lateral[-1]) +
    second_top_conv(pan_out[-1]))."""

    features: int = 128
    kernel: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> List[jax.Array]:
        n = len(feats)
        lats = [CSPConvBN(self.features, 1, name=f"conv_t.convs.{i}")(f)
                for i, f in enumerate(feats)]
        inner = [lats[-1]]
        for idx in range(n - 1, 0, -1):
            low = lats[idx - 1]
            up = _upsample_nearest(inner[0], low.shape[1], low.shape[2])
            inner.insert(0, CSPLayer(
                self.features, self.kernel,
                name=f"top_down_blocks.{n - 1 - idx}")(
                    jnp.concatenate([up, low], -1)))
        outs = [inner[0]]
        for idx in range(n - 1):
            down = DPModule(self.features, self.kernel, strides=2,
                            name=f"downsamples.{idx}")(outs[-1])
            outs.append(CSPLayer(
                self.features, self.kernel,
                name=f"bottom_up_blocks.{idx}")(
                    jnp.concatenate([down, inner[idx + 1]], -1)))
        top = DPModule(self.features, self.kernel, strides=2,
                       name="first_top_conv")(lats[-1])
        top = top + DPModule(self.features, self.kernel, strides=2,
                             name="second_top_conv")(outs[-1])
        outs.append(top)
        return outs


class ConvNormLayer(nn.Module):
    """ppdet ConvNormLayer: conv (no bias) + bn, NO activation."""

    features: int
    kernel: int
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=((p, p), (p, p)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=x.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                            dtype=x.dtype, name="norm")(x)


class PicoFeat(nn.Module):
    """pico_head.PicoFeat with share_cls_reg=True: per-LEVEL depthwise +
    pointwise ConvNormLayer stacks (NOT shared across levels), hardswish
    after each."""

    feat_out: int
    num_convs: int
    num_levels: int

    @nn.compact
    def __call__(self, feat, stage_idx: int):
        x = feat
        for i in range(self.num_convs):
            x = hardswish(ConvNormLayer(
                self.feat_out, 5, groups=self.feat_out,
                name=f"cls_conv_dw{stage_idx}.{i}")(x))
            x = hardswish(ConvNormLayer(
                self.feat_out, 1,
                name=f"cls_conv_pw{stage_idx}.{i}")(x))
        return x


class PicoHeadExact(nn.Module):
    """pico_head.PicoHead (GFL, share_cls_reg): fused head_cls{i} 1×1
    emitting [cls | 4·(reg_max+1)], decoded to (scores, xyxy boxes)."""

    num_classes: int
    reg_max: int = 7
    feat: int = 128
    num_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64)
    cell_offset: float = 0.5

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        conv_feat = PicoFeat(self.feat, self.num_convs, len(feats),
                             name="conv_feat")
        all_scores, all_boxes = [], []
        for level, f in enumerate(feats):
            h = conv_feat(f, level)
            out = nn.Conv(self.num_classes + 4 * (self.reg_max + 1),
                          (1, 1), dtype=f.dtype,
                          name=f"head_cls{level}")(h)
            cls, reg = (out[..., : self.num_classes],
                        out[..., self.num_classes:])
            b, hh, ww, _ = cls.shape
            stride = self.strides[level]
            scores = jax.nn.sigmoid(cls.astype(jnp.float32)).reshape(
                b, hh * ww, self.num_classes)
            reg = reg.astype(jnp.float32).reshape(
                b, hh * ww, 4, self.reg_max + 1)
            bins = jnp.arange(self.reg_max + 1, dtype=jnp.float32)
            ltrb = jnp.sum(jax.nn.softmax(reg, -1) * bins, -1) * stride
            cx = (jnp.arange(ww, dtype=jnp.float32)
                  + self.cell_offset) * stride
            cy = (jnp.arange(hh, dtype=jnp.float32)
                  + self.cell_offset) * stride
            gx, gy = jnp.meshgrid(cx, cy)
            centers = jnp.stack([gx, gy], -1).reshape(1, hh * ww, 2)
            boxes = jnp.concatenate(
                [centers - ltrb[..., 0:2], centers + ltrb[..., 2:4]], -1)
            all_scores.append(scores)
            all_boxes.append(jnp.broadcast_to(boxes, (b,) + boxes.shape[1:]))
        return (jnp.concatenate(all_scores, axis=1),
                jnp.concatenate(all_boxes, axis=1))


class PicoDetExact(nn.Module):
    """Full exact PicoDet: backbone → neck → head, checkpoint tree roots
    backbone/neck/head. Output contract matches LayoutDetector's
    non-DETR branch: (scores (N, A, C) f32, boxes (N, A, 4) xyxy in
    input pixels)."""

    num_classes: int
    scale: float = 1.0          # LCNet width
    neck_feat: int = 128        # CSP-PAN out_channels
    head_convs: int = 4         # PicoFeat num_convs
    reg_max: int = 7
    strides: Tuple[int, ...] = (8, 16, 32, 64)
    cell_offset: float = 0.5

    @nn.compact
    def __call__(self, x):
        feats = LCNetPico(self.scale, name="backbone")(x)
        feats = PicoCSPPAN(self.neck_feat, name="neck")(feats)
        return PicoHeadExact(
            self.num_classes, self.reg_max, self.neck_feat,
            self.head_convs, self.strides, self.cell_offset,
            name="head")(feats)

"""PP-LCNetV3 backbone — exact deploy (re-parameterized) topology.

The reference executes this network inside opaque ONNX graphs
(oar-ocr-core/src/models/detection/db.rs, recognition/crnn.rs run the
PP-OCRv4/v5 dets/recs whose backbone is PPLCNetV3). Here it is an explicit
flax module whose **structure, dimensions and parameter names mirror
PaddleOCR's `ppocr/modeling/backbones/rec_lcnetv3.py`** so real deploy
checkpoints convert 1:1 (runtime/ppocr_maps.py):

- stem ``conv1`` = Conv(3×3, s2, no bias) + BatchNorm, NO activation;
- five stages ``blocks2..blocks6`` of ``LCNetV3Block``s, each =
  depthwise ``LearnableRepLayer`` → optional SE → pointwise
  ``LearnableRepLayer``;
- a re-parameterized ``LearnableRepLayer`` (what `export_model.py`'s
  ``layer.rep()`` emits) = ``reparam_conv`` (with bias) → scalar
  LearnableAffineBlock ``lab`` → and, ONLY when stride != 2,
  hardswish + a second affine ``act.lab``;
- SE = avgpool → conv1(1×1, bias) → relu → conv2(1×1, bias) →
  hardsigmoid(slope=0.2, offset=0.5);
- det mode: four stage features pass through ``layer_list.{0..3}``
  1×1 convs projecting to int([16, 24, 56, 480] · scale) channels;
- rec mode: strides collapse H 48→3 while W only halves twice, then a
  (3, 2) average pool yields the (N, 1, W/8, C) sequence map.

Flax module names replicate the Paddle attribute paths (dots included)
so ``'/'.join(path).replace('kernel','weight')`` IS the official deploy
tensor name. NHWC layout; all convs use explicit symmetric k//2 padding
(Paddle semantics — flax "SAME" pads asymmetrically at stride 2).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hardswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hardsigmoid_paddle(x, slope: float = 0.2, offset: float = 0.5):
    """Paddle F.hardsigmoid(slope=0.2, offset=0.5) — PP-LCNet SE gating
    (NOT the relu6(x+3)/6 variant)."""
    return jnp.clip(slope * x + offset, 0.0, 1.0)


# (kernel, in_c, out_c, stride_hw, use_se) per block; channels pre-scale.
# Mirrors NET_CONFIG_det / NET_CONFIG_rec in rec_lcnetv3.py.
NET_CONFIG_DET = {
    "blocks2": [(3, 16, 32, (1, 1), False)],
    "blocks3": [(3, 32, 64, (2, 2), False), (3, 64, 64, (1, 1), False)],
    "blocks4": [(3, 64, 128, (2, 2), False), (3, 128, 128, (1, 1), False)],
    "blocks5": [(3, 128, 256, (2, 2), False), (5, 256, 256, (1, 1), False),
                (5, 256, 256, (1, 1), False), (5, 256, 256, (1, 1), False),
                (5, 256, 256, (1, 1), False)],
    "blocks6": [(5, 256, 512, (2, 2), True), (5, 512, 512, (1, 1), True),
                (5, 512, 512, (1, 1), False), (5, 512, 512, (1, 1), False)],
}
NET_CONFIG_REC = {
    "blocks2": [(3, 16, 32, (1, 1), False)],
    "blocks3": [(3, 32, 64, (1, 1), False), (3, 64, 64, (1, 1), False)],
    "blocks4": [(3, 64, 128, (2, 1), False), (3, 128, 128, (1, 1), False)],
    "blocks5": [(3, 128, 256, (1, 2), False), (5, 256, 256, (1, 1), False),
                (5, 256, 256, (1, 1), False), (5, 256, 256, (1, 1), False),
                (5, 256, 256, (1, 1), False)],
    "blocks6": [(5, 256, 512, (2, 1), True), (5, 512, 512, (1, 1), True),
                (5, 512, 512, (2, 1), False), (5, 512, 512, (1, 1), False)],
}
# det-mode 1×1 output projections (mv_c in rec_lcnetv3.py)
DET_MV_C = (16, 24, 56, 480)


def _pad(k: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    p = k // 2
    return ((p, p), (p, p))


class ConvBNLayer(nn.Module):
    """Conv (no bias) + BatchNorm2D, no activation (rec_lcnetv3
    ConvBNLayer)."""

    features: int
    kernel: int
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.strides, padding=_pad(self.kernel),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=x.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                            dtype=x.dtype, name="bn")(x)


class LearnableAffineBlock(nn.Module):
    """y = scale * x + bias with scalar learnable params (LAB)."""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (1,))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class ActLAB(nn.Module):
    """hardswish followed by an affine block (rec_lcnetv3 ``Act``)."""

    @nn.compact
    def __call__(self, x):
        return LearnableAffineBlock(name="lab")(hardswish(x))


class LearnableRepLayer(nn.Module):
    """Deploy (is_repped) form: fused ``reparam_conv`` (with bias) → lab →
    hardswish+act.lab UNLESS stride == 2 (rec_lcnetv3 LearnableRepLayer
    .forward: the activation is skipped on stride-2 layers)."""

    features: int
    kernel: int
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.strides, padding=_pad(self.kernel),
                    feature_group_count=self.groups, use_bias=True,
                    dtype=x.dtype, name="reparam_conv")(x)
        x = LearnableAffineBlock(name="lab")(x)
        if self.strides != (2, 2):
            x = ActLAB(name="act")(x)
        return x


class SEModule(nn.Module):
    """PP-LCNet squeeze-excitation: conv1/conv2 1×1 with bias, relu,
    hardsigmoid(0.2, 0.5) (rec_lcnetv3 SEModule)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                     keepdims=True).astype(x.dtype)
        s = nn.Conv(c // self.reduction, (1, 1), use_bias=True,
                    dtype=x.dtype, name="conv1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=True, dtype=x.dtype,
                    name="conv2")(s)
        return x * hardsigmoid_paddle(s)


class LCNetV3Block(nn.Module):
    """dw LearnableRepLayer → (SE) → pw LearnableRepLayer."""

    in_c: int
    out_c: int
    kernel: int
    strides: Tuple[int, int]
    use_se: bool

    @nn.compact
    def __call__(self, x):
        x = LearnableRepLayer(self.in_c, self.kernel, self.strides,
                              groups=self.in_c, name="dw_conv")(x)
        if self.use_se:
            x = SEModule(name="se")(x)
        return LearnableRepLayer(self.out_c, 1, (1, 1), name="pw_conv")(x)


class PPLCNetV3(nn.Module):
    """Exact PP-LCNetV3 trunk.

    ``mode="det"``: returns the four projected pyramid features
    (strides 4/8/16/32, channels int(mv_c·scale)).
    ``mode="rec"``: input (N, 48, W, 3) → (N, 1, W//8, C_out) feature map
    (the pre-Im2Seq layout the MultiHead consumes).
    ``mode="cls"``: global average pool → (N, C_out).
    """

    scale: float = 0.95
    mode: str = "rec"   # det | rec | cls

    @nn.compact
    def __call__(self, x):
        assert self.mode in ("det", "rec", "cls")
        det = self.mode == "det"
        cfg = NET_CONFIG_DET if det else NET_CONFIG_REC
        ch = lambda c: make_divisible(c * self.scale)

        x = ConvBNLayer(ch(16), 3, (2, 2), name="conv1")(x)

        feats: List[Any] = []
        for stage in ("blocks2", "blocks3", "blocks4", "blocks5", "blocks6"):
            for i, (k, in_c, out_c, stride, se) in enumerate(cfg[stage]):
                x = LCNetV3Block(ch(in_c), ch(out_c), k, stride, se,
                                 name=f"{stage}.{i}")(x)
            if stage != "blocks2":
                feats.append(x)

        if det:
            outs = []
            for i, f in enumerate(feats):
                outs.append(nn.Conv(int(DET_MV_C[i] * self.scale), (1, 1),
                                    use_bias=True, dtype=x.dtype,
                                    name=f"layer_list.{i}")(f))
            return tuple(outs)
        if self.mode == "rec":
            # F.avg_pool2d(kernel=[3, 2]): H 3→1, W→W/2 (total W/8)
            x = nn.avg_pool(x, (3, 2), strides=(3, 2))
            return x
        return jnp.mean(x, axis=(1, 2))

    def det_out_channels(self) -> Tuple[int, int, int, int]:
        return tuple(int(c * self.scale) for c in DET_MV_C)

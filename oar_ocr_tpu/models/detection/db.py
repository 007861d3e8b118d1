"""DB text detector — exact PP-OCRv4/v5 mobile det topology.

TPU-native counterpart of the reference's DBModel (oar-ocr-core/src/models/
detection/db.rs:94-281 — there an opaque ONNX graph behind OrtInfer; here an
explicit flax module so detection preprocess→forward→threshold compiles into
a single XLA program, with only contour geometry on host).

Structure, dimensions and parameter names mirror PaddleOCR's deploy
export (PP-OCRv5_mobile_det.yml):

- backbone: PPLCNetV3(scale=0.75, det) (models/lcnetv3.py) → 4 features
  at strides 4/8/16/32, channels int([16, 24, 56, 480]·scale);
- neck: RSEFPN(out=96, shortcut) (ppocr/modeling/necks/db_fpn.py) —
  ``ins_conv.{i}`` 1×1 RSELayers, top-down nearest upsampling,
  ``inp_conv.{i}`` 3×3 RSELayers to 24ch, upsample-concat at stride 4;
- head: DBHead binarize branch (ppocr/modeling/heads/det_db_head.py
  ``Head``): conv1(3×3 no bias) → BN+relu → deconv2×2 → BN+relu →
  deconv2×2 → sigmoid, full-resolution probability map.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..lcnetv3 import PPLCNetV3, hardsigmoid_paddle
from ..layers import upsample2x


class SEModuleFPN(nn.Module):
    """det_mobilenet_v3.SEModule (used by RSELayer): conv1/conv2 1×1 with
    bias, relu, hardsigmoid(slope=0.2, offset=0.5)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                     keepdims=True).astype(x.dtype)
        s = nn.Conv(c // self.reduction, (1, 1), use_bias=True,
                    dtype=x.dtype, name="conv1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=True, dtype=x.dtype, name="conv2")(s)
        return x * hardsigmoid_paddle(s)


class RSELayer(nn.Module):
    """db_fpn.RSELayer: in_conv (no bias) + SE, residual shortcut."""

    features: int
    kernel: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        ins = nn.Conv(self.features, (self.kernel, self.kernel),
                      padding=((p, p), (p, p)), use_bias=False,
                      dtype=x.dtype, name="in_conv")(x)
        se = SEModuleFPN(name="se_block")(ins)
        return ins + se if self.shortcut else se


class RSEFPN(nn.Module):
    """db_fpn.RSEFPN: ins_conv/inp_conv lists indexed shallow→deep,
    top-down adds, concat [p5·8, p4·4, p3·2, p2] at stride 4."""

    out_channels: int = 96
    shortcut: bool = True

    @nn.compact
    def __call__(self, c2, c3, c4, c5):
        oc = self.out_channels
        ins = [RSELayer(oc, 1, self.shortcut, name=f"ins_conv.{i}")
               for i in range(4)]
        inp = [RSELayer(oc // 4, 3, self.shortcut, name=f"inp_conv.{i}")
               for i in range(4)]
        in5 = ins[3](c5)
        in4 = ins[2](c4)
        in3 = ins[1](c3)
        in2 = ins[0](c2)

        out4 = in4 + upsample2x(in5)
        out3 = in3 + upsample2x(out4)
        out2 = in2 + upsample2x(out3)

        p5 = inp[3](in5)
        p4 = inp[2](out4)
        p3 = inp[1](out3)
        p2 = inp[0](out2)

        p5 = upsample2x(p5, 8)
        p4 = upsample2x(p4, 4)
        p3 = upsample2x(p3, 2)
        return jnp.concatenate([p5, p4, p3, p2], axis=-1)


class DBHeadBranch(nn.Module):
    """det_db_head.Head: conv1 (no bias) → conv_bn1+relu → conv2
    (2×2-stride-2 deconv, bias) → conv_bn2+relu → conv3 (deconv → 1ch) →
    sigmoid."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(c // 4, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=x.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="conv_bn1")(x)
        x = jax.nn.relu(x)
        x = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), use_bias=True,
                             dtype=x.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="conv_bn2")(x)
        x = jax.nn.relu(x)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), use_bias=True,
                             dtype=x.dtype, name="conv3")(x)
        return jax.nn.sigmoid(x)


class DBHead(nn.Module):
    """Inference DBHead: binarize branch only (the thresh branch exists
    only at training time; deploy returns the shrink map)."""

    @nn.compact
    def __call__(self, x):
        return DBHeadBranch(name="binarize")(x)


class DBNet(nn.Module):
    """Full DB detector. Input: normalized NHWC float batch (H, W multiples
    of 32). Output: (N, H, W) probability map in [0, 1].

    ``backbone``: "lcnet" (mobile models, PP-LCNetV3 ×0.75) or "hgnet"
    (server models, PP-HGNetV2 — models/hgnet.py)."""

    backbone_scale: float = 0.75
    fpn_channels: int = 96
    backbone: str = "lcnet"

    @nn.compact
    def __call__(self, x):
        if self.backbone == "hgnet":
            from ..hgnet import PPHGNetV2

            c2, c3, c4, c5 = PPHGNetV2(mode="det", name="backbone")(x)
        else:
            c2, c3, c4, c5 = PPLCNetV3(scale=self.backbone_scale,
                                       mode="det", name="backbone")(x)
        f = RSEFPN(self.fpn_channels, name="neck")(c2, c3, c4, c5)
        prob = DBHead(name="head")(f)
        return prob[..., 0]

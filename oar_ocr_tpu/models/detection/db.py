"""DB text detector: PP-LCNetV3 backbone + RSE-FPN neck + DB head.

TPU-native counterpart of the reference's DBModel (oar-ocr-core/src/models/
detection/db.rs:94-281 — there an opaque ONNX graph behind OrtInfer; here an
explicit flax module so detection preprocess→forward→threshold compiles into
a single XLA program, with only contour geometry on host).

Architecture follows the deployed PP-OCRv4/v5 detectors: RSE-FPN (residual
squeeze-excitation FPN, out 96ch) over strides 4/8/16/32, DB "binarize"
head (conv 3×3 → 2× deconv ×2) emitting a full-resolution probability map
through a sigmoid.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones import PPLCNetV3
from ..layers import ConvBNAct, SEModule, upsample2x


class RSELayer(nn.Module):
    """Conv + SE with optional residual shortcut (RSE-FPN building block)."""

    features: int
    kernel: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME",
                    use_bias=False, dtype=x.dtype)(x)
        se = SEModule()(x)
        return x + se if self.shortcut else se


class RSEFPN(nn.Module):
    """Top-down FPN with RSE layers; concatenates 4 levels at stride 4."""

    out_channels: int = 96

    @nn.compact
    def __call__(self, c2, c3, c4, c5):
        oc = self.out_channels
        in5 = RSELayer(oc, 1)(c5)
        in4 = RSELayer(oc, 1)(c4)
        in3 = RSELayer(oc, 1)(c3)
        in2 = RSELayer(oc, 1)(c2)

        out4 = in4 + upsample2x(in5)
        out3 = in3 + upsample2x(out4)
        out2 = in2 + upsample2x(out3)

        q = oc // 4
        p5 = RSELayer(q, 3)(in5)
        p4 = RSELayer(q, 3)(out4)
        p3 = RSELayer(q, 3)(out3)
        p2 = RSELayer(q, 3)(out2)

        p5 = upsample2x(p5, 8)
        p4 = upsample2x(p4, 4)
        p3 = upsample2x(p3, 2)
        return jnp.concatenate([p5, p4, p3, p2], axis=-1)


class DBHead(nn.Module):
    """Binarize branch: conv3×3 → BN/relu → deconv×2 → BN/relu → deconv×2 →
    sigmoid. Produces the probability map at input resolution."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = ConvBNAct(c // 4, (3, 3), act="relu")(x)
        x = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), dtype=x.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=x.dtype)(x)
        x = jax.nn.relu(x)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), dtype=x.dtype)(x)
        return jax.nn.sigmoid(x)


class DBNet(nn.Module):
    """Full DB detector. Input: normalized NHWC float batch (H, W multiples
    of 32). Output: (N, H, W) probability map in [0, 1].

    ``backbone``: "lcnet" (mobile models, PP-LCNetV3) or "hgnet"
    (server models, PP-HGNetV2 — models/hgnet.py)."""

    backbone_scale: float = 0.75
    fpn_channels: int = 96
    backbone: str = "lcnet"

    @nn.compact
    def __call__(self, x):
        if self.backbone == "hgnet":
            from ..hgnet import PPHGNetV2

            c2, c3, c4, c5 = PPHGNetV2(mode="det")(x)
        else:
            c2, c3, c4, c5 = PPLCNetV3(scale=self.backbone_scale, mode="det")(x)
        f = RSEFPN(self.fpn_channels)(c2, c3, c4, c5)
        prob = DBHead()(f)
        return prob[..., 0]

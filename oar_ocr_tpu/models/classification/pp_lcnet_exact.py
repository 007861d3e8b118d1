"""Exact PP-LCNet v1 classifier — the PULC checkpoint topology.

The reference's classification models (oar-ocr-core/src/models/
classification/pp_lcnet.rs:89-253 — doc orientation 4-cls, textline
orientation 2-cls, table wired/wireless) are PaddleClas PULC exports of
**PP-LCNet v1** (PP-LCNet_x1_0 / _x0_25), not LCNetV3: conv1 +
blocks2..blocks6 trunk (models/recognition/slanet_exact.py shares the
modules), then GAP → ``last_conv`` (1×1 to class_expand=1280, no bias) →
hardswish → (dropout) → flatten → ``fc``. Flax names mirror the Paddle
attribute paths so runtime/ppocr_maps.build_ppocr_map emits the official
checkpoint names.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..lcnetv3 import make_divisible
from ..recognition.slanet_exact import (PPLCNET_V1_CONFIG, DepthwiseSeparable,
                                        PPLCNetConvBN, hardswish)


class PPLCNetV1Cls(nn.Module):
    """PaddleClas PPLCNet(scale, class_num) at inference (dropout = id)."""

    class_num: int
    scale: float = 1.0
    class_expand: int = 1280

    @nn.compact
    def __call__(self, x):
        ch = lambda c: make_divisible(c * self.scale)
        x = PPLCNetConvBN(ch(16), 3, 2, name="conv1")(x)
        for stage in ("blocks2", "blocks3", "blocks4", "blocks5", "blocks6"):
            for i, (k, in_c, out_c, s, se) in enumerate(
                    PPLCNET_V1_CONFIG[stage]):
                x = DepthwiseSeparable(ch(in_c), ch(out_c), k, s, se,
                                       name=f"{stage}.{i}")(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                     keepdims=True).astype(x.dtype)        # GAP
        x = nn.Conv(self.class_expand, (1, 1), use_bias=False,
                    dtype=x.dtype, name="last_conv")(x)
        x = hardswish(x)
        x = x.reshape(x.shape[0], -1)                      # flatten
        return nn.Dense(self.class_num, name="fc")(
            x.astype(jnp.float32))


def build_pplcnet_cls_map(params, *, name: str = "pplcnet-cls"):
    from ...runtime.ppocr_maps import build_ppocr_map

    return build_ppocr_map(params, name=name)

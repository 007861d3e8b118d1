"""PP-HGNetV2 backbone — the server-class trunk.

The reference's server det/rec models (PP-OCRv5 server, pp-doclayout-l)
run PP-HGNetV2-family backbones inside their ONNX graphs (SURVEY §2.3
model table). Deployed topology: 3-conv stem, stages of HG blocks (a
chain of convs whose intermediate outputs are concatenated and squeezed
through two 1×1 aggregation convs), stride-2 downsample between stages.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBNAct


class HGBlock(nn.Module):
    """Chain of convs + concat-aggregate (PP-HGNet's signature block)."""

    mid: int
    out: int
    layer_num: int = 6
    kernel: int = 3
    identity: bool = False

    @nn.compact
    def __call__(self, x):
        outs = [x]
        h = x
        for _ in range(self.layer_num):
            h = ConvBNAct(self.mid, (self.kernel, self.kernel), act="relu")(h)
            outs.append(h)
        agg = jnp.concatenate(outs, axis=-1)
        agg = ConvBNAct(self.out // 2, (1, 1), act="relu")(agg)
        agg = ConvBNAct(self.out, (1, 1), act="relu")(agg)
        if self.identity and x.shape[-1] == self.out:
            agg = agg + x
        return agg


# (mid, out, blocks, downsample, layer_num) per stage — B4-class config
_STAGES_B4 = (
    (48, 128, 1, False, 6),
    (96, 512, 1, True, 6),
    (192, 1024, 3, True, 6),
    (384, 2048, 1, True, 6),
)


class PPHGNetV2(nn.Module):
    """Server backbone; det mode returns 4 pyramid levels, rec mode
    collapses height (matching PPLCNetV3's contract in backbones.py)."""

    mode: str = "det"                 # det | rec | cls
    stages: Sequence[Tuple[int, int, int, bool, int]] = _STAGES_B4
    stem_width: int = 32

    @nn.compact
    def __call__(self, x):
        assert self.mode in ("det", "rec", "cls")
        w = self.stem_width
        x = ConvBNAct(w, (3, 3), (2, 2), act="relu")(x)
        x = ConvBNAct(w, (3, 3), act="relu")(x)
        x = ConvBNAct(w * 2, (3, 3), act="relu")(x)

        feats: List = []
        for si, (mid, out, blocks, down, layer_num) in enumerate(self.stages):
            if down:
                stride = (2, 1) if self.mode == "rec" and si >= 2 else (2, 2)
                x = ConvBNAct(x.shape[-1], (3, 3), stride, act=None,
                              groups=x.shape[-1])(x)
            else:
                x = ConvBNAct(x.shape[-1], (3, 3), (2, 2), act=None,
                              groups=x.shape[-1])(x)
            for bi in range(blocks):
                x = HGBlock(mid, out, layer_num, identity=bi > 0)(x)
            feats.append(x)

        if self.mode == "det":
            return tuple(feats)                      # strides 4/8/16/32
        if self.mode == "rec":
            return jnp.mean(x, axis=1)               # (N, T, C)
        return jnp.mean(x, axis=(1, 2))

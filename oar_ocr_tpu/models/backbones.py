"""PP-LCNet-style backbones (detection, recognition, classification modes).

The reference runs these as opaque ONNX graphs (oar-ocr-core/src/models/*);
here PP-LCNetV3 is an explicit flax module. The deployed (re-param-fused)
topology is implemented: stem conv + five depthwise-separable stages with SE
on the last stage, h-swish activations.

Modes:
- ``det``: returns the four pyramid features (strides 4/8/16/32) consumed by
  the RSE-FPN neck (models/detection/db.rs pipeline).
- ``rec``: input (N, 48, W, 3); height is progressively collapsed while
  width is only halved at stem and the last two stages (final T = W/8,
  matching rec shape [3,48,320] → 40 timesteps).
- ``cls``: standard 224×224 classification trunk with global pooling
  (PP-LCNet for doc/textline orientation, pp_lcnet.rs:89-133).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBNAct, DepthSepConv


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# Stage configs: list of (kernel, out_channels, use_se) per stage; the first
# block of each stage carries the stage stride.
_STAGES: Sequence[Sequence[Tuple[int, int, bool]]] = (
    # stage2 (stride 1)
    ((3, 32, False),),
    # stage3 (stride 2)
    ((3, 64, False), (3, 64, False)),
    # stage4 (stride 2)
    ((3, 128, False), (3, 128, False)),
    # stage5 (stride 2)
    ((3, 256, False), (5, 256, False), (5, 256, False), (5, 256, False),
     (5, 256, False)),
    # stage6 (stride 2, SE)
    ((5, 512, True), (5, 512, True)),
)


class PPLCNetV3(nn.Module):
    """Parametric PP-LCNet backbone."""

    scale: float = 0.75
    mode: str = "det"  # det | rec | cls

    @nn.compact
    def __call__(self, x):
        assert self.mode in ("det", "rec", "cls")
        ch = lambda c: make_divisible(c * self.scale)

        if self.mode == "rec":
            # Height collapses 48→1; width stride only at stem + stages 5/6.
            stage_strides = [(1, 1), (2, 1), (2, 1), (2, 2), (2, 2)]
        else:
            stage_strides = [(1, 1), (2, 2), (2, 2), (2, 2), (2, 2)]

        x = ConvBNAct(ch(16), (3, 3), (2, 2), act="hswish")(x)

        feats: List = []
        for stage_idx, stage in enumerate(_STAGES):
            for block_idx, (kernel, out_c, use_se) in enumerate(stage):
                strides = stage_strides[stage_idx] if block_idx == 0 else (1, 1)
                x = DepthSepConv(ch(out_c), kernel, strides, use_se)(x)
            feats.append(x)

        if self.mode == "det":
            # strides 4, 8, 16, 32 (stages 3..6)
            return feats[1], feats[2], feats[3], feats[4]
        if self.mode == "rec":
            # collapse any residual height to 1 → (N, T, C)
            x = jnp.mean(x, axis=1)
            return x
        # cls: global average pool → (N, C)
        return jnp.mean(x, axis=(1, 2))

    @property
    def det_channels(self) -> Tuple[int, int, int, int]:
        ch = lambda c: make_divisible(c * self.scale)
        return (ch(64), ch(128), ch(256), ch(512))

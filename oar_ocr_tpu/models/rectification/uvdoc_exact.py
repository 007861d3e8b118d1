"""UVDoc rectification network — the published UVDoc architecture.

The reference drives UVDoc as an opaque ONNX graph
(oar-ocr-core/src/models/rectification/uvdoc.rs:39-161: resize to the
712×488 input, x/255 normalize, displacement-grid output remapped by
processors/uvdoc_postprocess.rs). The graph is the public UVDoc model
(tanguymagne/UVDoc, adapted from DDCP "Document Dewarping with Control
Points"): a 5×5-conv head, dilated-residual encoder to stride 16
(712×488 → exactly 45×31 — the UVDoc GRID_SIZE), six parallel dilated
bridge branches (dilation chains 1 / 2 / 5 / 8-3-2 / 12-7-4 / 18-12-6)
concatenated and fused, and two point heads: ``out_point_positions2D``
(B, 2, 45, 31) normalized sampling grid + ``out_point_positions3D``
(unused at inference).

Dims (num_filter 32, block counts) follow the public repo; Paddle
deploy tensor names bind at conversion time (docs/ROADMAP.md exactness
inventory). Structure is parity-tested against the torch mirror
(tools/torch_ref_uvdoc.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

UVDOC_INPUT_HW = (712, 488)
UVDOC_GRID_HW = (45, 31)

BRIDGE_DILATIONS: Tuple[Tuple[int, ...], ...] = (
    (1,), (2,), (5,), (8, 3, 2), (12, 7, 4), (18, 12, 6))


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 5
    strides: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        k, d = self.kernel, self.dilation
        p = d * (k // 2)
        x = nn.Conv(self.features, (k, k),
                    strides=(self.strides, self.strides),
                    padding=((p, p), (p, p)),
                    kernel_dilation=(d, d), dtype=x.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="bn")(x)
        return jax.nn.relu(x)


class ResidualBlock(nn.Module):
    """3×3 conv pair with identity/projection shortcut (DDCP residual)."""

    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        f = self.features
        h = nn.Conv(f, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=x.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=x.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="bn2")(h)
        if self.strides != 1 or x.shape[-1] != f:
            x = nn.Conv(f, (1, 1), strides=(self.strides, self.strides),
                        use_bias=False, dtype=x.dtype,
                        name="downsample.conv")(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             dtype=x.dtype, name="downsample.bn")(x)
        return jax.nn.relu(x + h)


class PointHead(nn.Module):
    """conv-bn-relu → 3×3 projection to coordinate channels."""

    out_channels: int
    mid: int

    @nn.compact
    def __call__(self, x):
        x = ConvBNRelu(self.mid, 3, name="conv")(x)
        return nn.Conv(self.out_channels, (3, 3),
                       padding=((1, 1), (1, 1)), dtype=x.dtype,
                       name="proj")(x)


class UVDocNetExact(nn.Module):
    """Full UVDoc net. Input (B, 712, 488, 3) x/255; output 2-D grid
    (B, 45, 31, 2) of normalized [-1, 1] sampling positions (+ the 3-D
    head, returned for completeness)."""

    num_filter: int = 32
    block_nums: Tuple[int, int] = (3, 4)

    @nn.compact
    def __call__(self, x):
        nf = self.num_filter
        # head: /4 (two stride-2 5×5 convs)
        x = ConvBNRelu(nf, 5, strides=2, name="resnet_head.0")(x)
        x = ConvBNRelu(nf, 5, name="resnet_head.1")(x)
        x = ConvBNRelu(nf * 2, 5, strides=2, name="resnet_head.2")(x)
        # dilated-residual encoder: /8 then /16
        for i in range(self.block_nums[0]):
            x = ResidualBlock(nf * 4, strides=2 if i == 0 else 1,
                              name=f"resnet_down.layer1.{i}")(x)
        for i in range(self.block_nums[1]):
            x = ResidualBlock(nf * 8, strides=2 if i == 0 else 1,
                              name=f"resnet_down.layer2.{i}")(x)
        # six parallel dilated bridges, concat, 1×1 fuse
        branches = []
        for bi, dils in enumerate(BRIDGE_DILATIONS, start=1):
            h = x
            for ci, d in enumerate(dils):
                h = ConvBNRelu(nf * 8, 3, dilation=d,
                               name=f"bridge_{bi}.{ci}")(h)
            branches.append(h)
        x = jnp.concatenate(branches, axis=-1)
        x = ConvBNRelu(nf * 8, 1, name="bridge_concat")(x)
        grid2d = PointHead(2, nf * 4, name="out_point_positions2D")(x)
        grid3d = PointHead(3, nf * 4, name="out_point_positions3D")(x)
        return (jnp.clip(grid2d.astype(jnp.float32), -1.0, 1.0),
                grid3d.astype(jnp.float32))

"""Shared NN building blocks (flax.linen, NHWC, inference-mode BN).

These back the classic-model families (DB detectors, PP-LCNet classifiers,
SVTR recognizers — reference: oar-ocr-core/src/models/*). The reference
executes ONNX graphs; here each architecture is an explicit flax module so
XLA sees one fusible program per model. Layout is NHWC throughout (TPU conv
native layout); weights converted from deployed Paddle/ONNX models are
transposed at conversion time, and re-parameterizable training-time branches
(PP-LCNetV3's multi-kernel depthwise / learnable-activation blocks) are
assumed fused into plain convs by the deploy-time export, which is how the
reference's ONNX models ship too.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def hswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hsigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


ACT = {
    "relu": jax.nn.relu,
    "hswish": hswish,
    "swish": jax.nn.swish,
    "gelu": jax.nn.gelu,
    None: lambda x: x,
}


class ConvBNAct(nn.Module):
    """Conv2D + folded BatchNorm + activation.

    BN runs in inference mode (scale/bias/mean/var as converted constants);
    ``groups=channels`` gives a depthwise conv.
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    act: Optional[str] = "hswish"
    use_bn: bool = True
    padding: Any = "SAME"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, feature_group_count=self.groups,
                    use_bias=not self.use_bn, dtype=x.dtype)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             dtype=x.dtype)(x)
        return ACT[self.act](x)


class SEModule(nn.Module):
    """Squeeze-and-excitation with hard-sigmoid gating (PP-LCNet style)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(max(c // self.reduction, 1), (1, 1), dtype=x.dtype)(s)
        s = jax.nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=x.dtype)(s)
        return x * hsigmoid(s)


class DepthSepConv(nn.Module):
    """Depthwise-separable block: dw k×k + BN + act (+SE) + pw 1×1 + BN + act."""

    features: int
    kernel: int = 3
    strides: Tuple[int, int] = (1, 1)
    use_se: bool = False
    act: str = "hswish"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        x = ConvBNAct(c_in, (self.kernel, self.kernel), self.strides,
                      groups=c_in, act=self.act)(x)
        if self.use_se:
            x = SEModule()(x)
        x = ConvBNAct(self.features, (1, 1), act=self.act)(x)
        return x


class MLP(nn.Module):
    hidden: int
    out: int
    act: str = "gelu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=x.dtype)(x)
        x = ACT[self.act](x)
        return nn.Dense(self.out, dtype=x.dtype)(x)


class MultiHeadSelfAttention(nn.Module):
    """Plain global MHSA over a (B, T, C) sequence (SVTR mixing blocks,
    small T — XLA fuses this fine without a custom kernel)."""

    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=x.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(y):
            return y.reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhtd,bhsd->bhts", q, k) / jnp.sqrt(head_dim).astype(x.dtype)
        if mask is not None:
            attn = jnp.where(mask, attn, jnp.finfo(attn.dtype).min)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        return nn.Dense(c, dtype=x.dtype)(out)


class TransformerBlock(nn.Module):
    """Pre-LN transformer block (SVTR global mixer)."""

    num_heads: int
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, mask=None):
        c = x.shape[-1]
        x = x + MultiHeadSelfAttention(self.num_heads)(
            nn.LayerNorm(dtype=x.dtype)(x), mask)
        x = x + MLP(int(c * self.mlp_ratio), c)(nn.LayerNorm(dtype=x.dtype)(x))
        return x


def upsample2x(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbor upsample (FPN top-down path)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), method="nearest")

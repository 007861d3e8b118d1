"""Fused RMSNorm(+residual) and RMSNorm→RoPE — Pallas TPU kernels.

TPU-native analogs of the reference's fused decode ops
(oar-ocr-vl/src/hunyuanocr/dynamic_kv.rs FusedAddRmsNormBf16 /
FusedRmsNormRopeBf16 / FusedRopeBf16 — SURVEY §2.5 "fused native decode
ops"): the hot per-token decode path runs norm→rotate as ONE VMEM-resident
kernel instead of separate HBM round trips.

- ``fused_add_rmsnorm(x, residual, scale)`` → (normed, x+residual): the
  layer-boundary residual-add + RMSNorm pair;
- ``fused_qk_norm_rope(x, scale, cos, sin)``: per-head-dim RMSNorm (the
  Hunyuan/Qwen3 qk-norm) followed by half-split rotary, on (R, T, D) rows
  (R = batch·heads).

Both have exact XLA fallbacks (used under OAR_TPU_DISABLE_PALLAS or on
CPU) and are parity-tested in interpret mode (tests/test_fused_norm_rope.py).
All math accumulates in f32 regardless of the storage dtype.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _use_pallas() -> bool:
    if os.environ.get("OAR_TPU_DISABLE_PALLAS"):
        return False
    return jax.default_backend() in ("tpu", "axon")


# ------------------------- add + rmsnorm -------------------------

def _add_rmsnorm_kernel(x_ref, res_ref, scale_ref, out_ref, new_res_ref,
                        *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    r = res_ref[...].astype(jnp.float32)
    s = x + r
    new_res_ref[...] = s.astype(new_res_ref.dtype)
    var = jnp.mean(jnp.square(s), axis=-1, keepdims=True)
    normed = s * jax.lax.rsqrt(var + eps)
    out_ref[...] = (normed * scale_ref[...].astype(jnp.float32)
                    ).astype(out_ref.dtype)


def _add_rmsnorm_xla(x, residual, scale, eps):
    s = x.astype(jnp.float32) + residual.astype(jnp.float32)
    var = jnp.mean(jnp.square(s), axis=-1, keepdims=True)
    normed = s * jax.lax.rsqrt(var + eps)
    return ((normed * scale.astype(jnp.float32)).astype(x.dtype),
            s.astype(x.dtype))


@functools.partial(jax.jit, static_argnames=("eps", "interpret",
                                             "use_pallas"))
def fused_add_rmsnorm(x: jax.Array, residual: jax.Array, scale: jax.Array,
                      *, eps: float = 1e-6, interpret: bool = False,
                      use_pallas: bool = True):
    """x, residual: (..., T, D); scale (D,). Returns
    (rmsnorm(x+residual)·scale, x+residual)."""
    if not (use_pallas and (_use_pallas() or interpret)):
        return _add_rmsnorm_xla(x, residual, scale, eps)
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    r2 = residual.reshape(-1, d)
    rows = x2.shape[0]
    block = min(rows, 256)
    grid = (pl.cdiv(rows, block),)
    out, new_res = pl.pallas_call(
        functools.partial(_add_rmsnorm_kernel, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((block, d), lambda i: (i, 0)),
                  pl.BlockSpec((block, d), lambda i: (i, 0)),
                  pl.BlockSpec((d,), lambda i: (0,))],
        out_specs=[pl.BlockSpec((block, d), lambda i: (i, 0)),
                   pl.BlockSpec((block, d), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((rows, d), x.dtype),
                   jax.ShapeDtypeStruct((rows, d), x.dtype)],
        interpret=interpret,
    )(x2, r2, scale)
    return out.reshape(shape), new_res.reshape(shape)


# ------------------------- qk rmsnorm + rope -------------------------

def _qk_norm_rope_kernel(x_ref, scale_ref, cos_ref, sin_ref, out_ref,
                         *, eps: float):
    # x_ref: (1, bt, D); cos/sin: (bt, D/2); scale (D,)
    x = x_ref[0].astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps) * scale_ref[...].astype(jnp.float32)
    d2 = x.shape[-1] // 2
    x1, x2 = x[:, :d2], x[:, d2:]
    cos = cos_ref[...].astype(jnp.float32)
    sin = sin_ref[...].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                          axis=-1)
    out_ref[0] = out.astype(out_ref.dtype)


def _qk_norm_rope_xla(x, scale, cos, sin, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    d2 = xf.shape[-1] // 2
    x1, x2 = xf[..., :d2], xf[..., d2:]
    c = cos.astype(jnp.float32)[None]
    s = sin.astype(jnp.float32)[None]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s],
                           axis=-1).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret",
                                             "use_pallas"))
def fused_qk_norm_rope(x: jax.Array, scale: jax.Array, cos: jax.Array,
                       sin: jax.Array, *, eps: float = 1e-6,
                       interpret: bool = False, use_pallas: bool = True):
    """x: (R, T, D) q or k rows (R = batch·heads); scale (D,);
    cos/sin (T, D/2). Returns the normed+rotated rows."""
    if not (use_pallas and (_use_pallas() or interpret)):
        return _qk_norm_rope_xla(x, scale, cos, sin, eps)
    r, t, d = x.shape
    block_t = min(t, 256)
    grid = (r, pl.cdiv(t, block_t))
    return pl.pallas_call(
        functools.partial(_qk_norm_rope_kernel, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((1, block_t, d), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((d,), lambda i, j: (0,)),
                  pl.BlockSpec((block_t, d // 2), lambda i, j: (j, 0)),
                  pl.BlockSpec((block_t, d // 2), lambda i, j: (j, 0))],
        out_specs=pl.BlockSpec((1, block_t, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((r, t, d), x.dtype),
        interpret=interpret,
    )(x, scale, cos, sin)

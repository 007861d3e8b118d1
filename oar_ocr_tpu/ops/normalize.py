"""Fused uint8 → float image normalization (Pallas TPU kernel + XLA fallback).

TPU-native replacement for the reference's SIMD CPU kernels
``normalize_chw_into`` / ``normalize_hwc_into`` / ``normalize_crnn_chw_into``
(oar-ocr-core/src/processors/simd.rs:28,52,248) and ``NormalizeImage``
(processors/normalization.rs:18-26 — the alpha/beta form: out = x*alpha +
beta with alpha = scale/std, beta = -mean/std).

Design notes (TPU-first):
- Images live as NHWC uint8 on device (host ships raw decoded bytes; 3 B/px
  over PCIe instead of 12 B/px f32 — the same bandwidth argument the
  reference makes for zero-copy CTC logits).
- The kernel views the batch as a 2-D array (N*H, W*C) so the lane dimension
  is large and aligned; per-channel alpha/beta are pre-tiled to a (W*C,) row
  on host once per bucket shape (cached) so the kernel is a pure fused
  multiply-add with no modular channel arithmetic.
- Channel swap (RGB→BGR, e.g. rec preprocessing normalization.rs:202-210) is
  folded into the tiled alpha/beta/gather-free layout by permuting at tile
  construction time — the kernel itself never branches.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_ROW_TILE = 256  # sublane tile of the (N*H, W*C) view


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=64)
def _tiled_coeffs(width: int, channels: int, alpha: Tuple[float, ...],
                  beta: Tuple[float, ...], swap_rb: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Per-lane alpha/beta rows for the (H, W*C) view, padded to lanes."""
    order = list(range(channels))
    if swap_rb:
        order[0], order[2] = order[2], order[0]
    a = np.array([alpha[c] for c in order], np.float32)
    b = np.array([beta[c] for c in order], np.float32)
    row_a = np.tile(a, width)
    row_b = np.tile(b, width)
    padded = _round_up(width * channels, _LANE)
    row_a = np.pad(row_a, (0, padded - row_a.size))
    row_b = np.pad(row_b, (0, padded - row_b.size))
    return row_a, row_b


def _normalize_kernel(x_ref, a_ref, b_ref, o_ref):
    # uint8 → int32 → f32: Mosaic (measured on the axon backend) rejects
    # the direct uint8 → f32 cast inside a kernel
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    o_ref[:] = (x * a_ref[:] + b_ref[:]).astype(o_ref.dtype)


def normalize_images(
    images_u8: jax.Array,
    *,
    mean: Sequence[float],
    std: Sequence[float],
    scale: float = 1.0 / 255.0,
    swap_rb: bool = False,
    out_dtype=jnp.float32,
    use_pallas: bool = True,
) -> jax.Array:
    """Normalize a padded NHWC uint8 batch to float NHWC.

    out = (x * scale - mean) / std, optionally with R/B swapped first.
    ``images_u8``: (N, H, W, C) uint8, already bucket-padded.
    """

    n, h, w, c = images_u8.shape
    alpha = tuple(float(scale) / float(s) for s in std)
    beta = tuple(-float(m) / float(s) for m, s in zip(mean, std))

    platform = jax.devices()[0].platform
    if not use_pallas or platform not in ("tpu", "axon"):
        x = images_u8.astype(jnp.float32)
        if swap_rb and c == 3:
            x = x[..., ::-1]
        a = jnp.asarray(alpha, jnp.float32)
        b = jnp.asarray(beta, jnp.float32)
        return (x * a + b).astype(out_dtype)

    row_a, row_b = _tiled_coeffs(w, c, alpha, beta, swap_rb)
    padded_wc = row_a.size
    rows = images_u8.reshape(n * h, w * c)
    rows = jnp.pad(rows, ((0, _round_up(n * h, _ROW_TILE) - n * h),
                          (0, padded_wc - w * c)))
    total_rows = rows.shape[0]

    try:
        out = pl.pallas_call(
            _normalize_kernel,
            grid=(total_rows // _ROW_TILE,),
            in_specs=[
                pl.BlockSpec((_ROW_TILE, padded_wc), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, padded_wc), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, padded_wc), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_ROW_TILE, padded_wc),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((total_rows, padded_wc),
                                           out_dtype),
        )(rows, jnp.asarray(row_a)[None, :], jnp.asarray(row_b)[None, :])
    except Exception:  # pragma: no cover - backend Mosaic gap
        # per-kernel kill-ladder (repo convention): a Mosaic lowering
        # gap on some backend must degrade to the XLA form, not fail
        return normalize_images(images_u8, mean=mean, std=std,
                                scale=scale, swap_rb=swap_rb,
                                out_dtype=out_dtype, use_pallas=False)

    out = out[: n * h, : w * c].reshape(n, h, w, c)
    if swap_rb and c == 3:
        # the kernel computed lane c as in_c·alpha[swap(c)]+beta[swap(c)]
        # (coeffs permuted at tile build, no in-kernel gathers); the
        # channel-order swap itself happens here, as a fused XLA reverse
        # — without it the output stayed in input order and the "swap"
        # was a coefficient permutation only
        out = out[..., ::-1]
    return out

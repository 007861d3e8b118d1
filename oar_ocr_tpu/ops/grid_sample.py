"""Batched bilinear grid sampling (displacement-grid remap).

TPU-native replacement for the reference's UVDoc postprocess
(oar-ocr-core/src/processors/uvdoc_postprocess.rs:1-407 — CPU bilinear
remap of the rectified document through the predicted displacement grid).
Named a Pallas/device candidate in SURVEY §2.2; implemented as the same
gather-based bilinear formulation as ops/warp.sample_transform so XLA
fuses the coordinate math, gather, and interpolation into one program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def grid_sample(images: jax.Array, coords: jax.Array, *, out_dtype=jnp.float32
                ) -> jax.Array:
    """Sample ``images`` (N, H, W, C) at per-pixel ``coords`` (N, Ho, Wo, 2)
    given as absolute (x, y) source pixel positions. Border-clamped."""

    n, h, w, c = images.shape
    _, ho, wo, _ = coords.shape

    # border-clamp the COORDINATE before floor (clamping only the
    # integer neighbors made coords in (−1, 0) blend pixels 0 and 1 with
    # inverted weights instead of yielding the border pixel — the remap
    # convention the reference's CPU bilinear uses)
    sx = jnp.clip(coords[..., 0].reshape(n, -1), 0.0, w - 1.0)
    sy = jnp.clip(coords[..., 1].reshape(n, -1), 0.0, h - 1.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    x0i = x0.astype(jnp.int32)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = y0.astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    flat = images.reshape(n * h * w, c)
    base = (jnp.arange(n, dtype=jnp.int32) * h)[:, None]

    def fetch(yi, xi):
        lin = (base + yi) * w + xi
        return jnp.take(flat, lin.reshape(-1), axis=0).reshape(n, -1, c)

    v00 = fetch(y0i, x0i).astype(jnp.float32)
    v01 = fetch(y0i, x1i).astype(jnp.float32)
    v10 = fetch(y1i, x0i).astype(jnp.float32)
    v11 = fetch(y1i, x1i).astype(jnp.float32)

    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    out = top * (1.0 - fy) + bot * fy
    return out.reshape(n, ho, wo, c).astype(out_dtype)


def normalized_grid_to_pixels(grid: jax.Array, h: int, w: int) -> jax.Array:
    """Convert a [-1, 1]-normalized (…, 2) sampling grid to absolute pixel
    coordinates (align_corners convention: -1 → 0, +1 → size-1)."""

    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    return jnp.stack([gx, gy], axis=-1)

"""Device-side detection ops: separable resize, bit-packing, quad scoring.

Performance-critical redesign of the detection path driven by measured
link characteristics (device→host runs ~40-50 MB/s on this setup, while
host→device is ~1.2 GB/s and the MXU is idle during preprocessing):

1. ``separable_resize_normalize`` — axis-aligned per-image resize expressed
   as two interpolation matmuls (out = R_y · img · C_xᵀ) built on device
   from per-image scales. Bilinear tent weights are exact; the contraction
   runs on the MXU instead of the VPU-hostile 4-neighbor gather
   (ops/warp.sample_transform), which remains for true perspective crops.
2. ``pack_bits`` — thresholded probability maps leave the device as 1
   bit/pixel (32× less than f32), host contours run on the unpacked bitmap.
3. ``quad_scores`` — box_score_fast (db_score.rs:34 — mean probability
   inside the mini-box) evaluated on device against the *resident* prob
   map via half-plane tests over convex quads, so the full-resolution map
   never crosses the link.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _interp_weights(dst_pad: int, src_len: int, src_valid, dst_valid,
                    dtype=jnp.float32) -> jax.Array:
    """(B, dst_pad, src_len) bilinear tent weights in cv2's half-pixel
    convention, with border clamp (weights sum to 1 inside the valid
    region, 0 outside)."""

    o = jnp.arange(dst_pad, dtype=jnp.float32)[None, :]         # (1, Do)
    scale = (src_valid / dst_valid).astype(jnp.float32)[:, None]  # (B, 1)
    pos = (o + 0.5) * scale - 0.5                               # (B, Do)
    pos = jnp.clip(pos, 0.0, src_valid.astype(jnp.float32)[:, None] - 1.0)
    i = jnp.arange(src_len, dtype=jnp.float32)[None, None, :]   # (1, 1, S)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, :, None] - i))    # (B, Do, S)
    w = jnp.where(o[:, :, None] < dst_valid.astype(jnp.float32)[:, None, None],
                  w, 0.0)
    return w.astype(dtype)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "out_dtype",
                                             "pad_value"))
def separable_resize_normalize(
    images: jax.Array,         # (B, H, W, C) uint8/float, zero-padded
    src_h: jax.Array,          # (B,) int32 valid source heights
    src_w: jax.Array,          # (B,) int32 valid source widths
    dst_h: jax.Array,          # (B,) int32 valid target heights
    dst_w: jax.Array,          # (B,) int32 valid target widths
    alpha: jax.Array,          # (C,) fused normalize: out*alpha + beta
    beta: jax.Array,
    *,
    out_h: int,
    out_w: int,
    out_dtype=jnp.bfloat16,
    pad_value: float = 0.0,
) -> jax.Array:
    """Per-image bilinear resize to (dst_h[b], dst_w[b]) inside a padded
    (out_h, out_w) tile, with fused normalization. f32 weights on the MXU
    (precision HIGHEST) keep bilinear exact to float rounding.

    ``pad_value`` fills slots beyond (dst_h, dst_w): 0.0 for detection
    (the reference's ToBatch pads the NORMALIZED tensor with zeros,
    core/batch/mod.rs:215-453); −1.0 for recognition (the reference pads
    the IMAGE with black and then normalizes — utils/image.rs:588-591
    PaddingStrategy::Black + x·2/255−1 maps pad pixels to −1)."""

    images_u8 = images
    b, h, w, c = images_u8.shape
    ry = _interp_weights(out_h, h, src_h, dst_h)                # (B, Ho, H)
    cx = _interp_weights(out_w, w, src_w, dst_w)                # (B, Wo, W)
    img = images_u8.astype(jnp.float32)
    # (B, Ho, H) × (B, H, W, C) → (B, Ho, W, C)
    t = jax.lax.dot_general(
        ry, img, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)
    # (B, Wo, W) × (B, Ho, W, C): contract W
    t = t.transpose(0, 1, 3, 2)                                 # (B, Ho, C, W)
    out = jax.lax.dot_general(
        t, cx, (((3,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)                    # (B, Ho, C, Wo)
    out = out.transpose(0, 1, 3, 2)                             # (B, Ho, Wo, C)
    out = out * alpha + beta
    row = jnp.arange(out_h, dtype=jnp.int32)[None, :, None, None]
    col = jnp.arange(out_w, dtype=jnp.int32)[None, None, :, None]
    mask = (row < dst_h[:, None, None, None]) & (col < dst_w[:, None, None, None])
    return jnp.where(mask, out, pad_value).astype(out_dtype)


def pack_bits(bitmap: jax.Array) -> jax.Array:
    """(…, W) bool/int → (…, W/8) uint8, MSB-first (np.unpackbits order).
    W must be a multiple of 8 (det tiles are multiples of 32)."""

    shape = bitmap.shape
    w = shape[-1]
    x = bitmap.astype(jnp.uint8).reshape(shape[:-1] + (w // 8, 8))
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(x * weights, axis=-1).astype(jnp.uint8)


@jax.jit
def row_occupancy_mask(packed: jax.Array) -> jax.Array:
    """(B, H, W/8) packed bitmap → (B, H/8) uint8: bit r set when row r
    has any foreground pixel. ~0.1% of the bitmap's bytes — shipped
    ahead of the bitmap so the host can size a sparse row fetch on slow
    d2h links (docs/environment-variables.md: d2h swings to ~3 MB/s;
    the full 1-bit/px bitmap then dominates the detect wall time)."""
    row_any = jnp.any(packed != 0, axis=-1)         # (B, H)
    return pack_bits(row_any)


# det-bitmap sparse-fetch tile geometry: 16 rows × 4 packed bytes
# (= 32 px) per tile — 64 bytes, raster-ordered (ti, tj). Text covers
# ~5-15% of a page's TILES but ~50-80% of its ROWS (every text line
# occupies full rows), so the 2-D gather ships several times fewer bytes
# than the row gather at the same budget discipline.
DET_TILE_H = 16
DET_TILE_W8 = 4


def det_tileable(h: int, w8: int) -> bool:
    return h % DET_TILE_H == 0 and w8 % DET_TILE_W8 == 0


@jax.jit
def tile_occupancy_mask(packed: jax.Array) -> jax.Array:
    """(B, H, W/8) packed bitmap → (B, ceil(nT/8)) uint8: bit t set when
    flat tile t (raster (ti, tj)) has any foreground pixel. Shipped ahead
    of the bitmap so the host can size a sparse tile fetch."""
    b, h, w8 = packed.shape
    nth, ntw = h // DET_TILE_H, w8 // DET_TILE_W8
    t = packed.reshape(b, nth, DET_TILE_H, ntw, DET_TILE_W8)
    occ = jnp.any(t != 0, axis=(2, 4))              # (B, nth, ntw)
    occ = occ.reshape(b, nth * ntw)
    # pad the flat tile vector to a byte boundary: legal det buckets can
    # yield nT % 8 != 0 (e.g. 704×4000 → 44·125 = 5500 tiles) and
    # pack_bits requires multiples of 8; hosts unpack with count=nT
    pad = (-occ.shape[1]) % 8
    if pad:
        occ = jnp.pad(occ, ((0, 0), (0, pad)))
    return pack_bits(occ)


@functools.partial(jax.jit, static_argnames=("k",))
def gather_occupied_tiles(packed: jax.Array, *, k: int):
    """Gather the first ``k`` tiles of each bitmap ordered
    occupied-tiles-first (ascending flat index within each class).
    Returns (tiles (B, k, 64) uint8, idx (B, k) int32 flat tile index).

    With k ≥ the page's occupied-tile count this loses nothing: extra
    gathered tiles are all-zero, and scattering into a zeroed buffer
    reproduces the full bitmap bit-exactly (detector._fetch_bitmap)."""
    b, h, w8 = packed.shape
    nth, ntw = h // DET_TILE_H, w8 // DET_TILE_W8
    nt = nth * ntw
    t = (packed.reshape(b, nth, DET_TILE_H, ntw, DET_TILE_W8)
         .transpose(0, 1, 3, 2, 4)
         .reshape(b, nt, DET_TILE_H * DET_TILE_W8))
    occ = jnp.any(t != 0, axis=-1)                  # (B, nt)
    score = occ.astype(jnp.int32) * (2 * nt) - jnp.arange(
        nt, dtype=jnp.int32)[None, :]
    _, idx = jax.lax.top_k(score, k)                # occupied first, asc
    tiles = jnp.take_along_axis(t, idx[:, :, None], axis=1)
    return tiles, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def gather_occupied_tiles_packed(packed: jax.Array, *, k: int) -> jax.Array:
    """One-fetch variant of :func:`gather_occupied_tiles` for
    speculatively sized budgets: folds (count, idx, tiles) into a single
    ``(B, 4 + k·(4+64))`` uint8 payload so the sparse det fetch costs ONE
    device→host round-trip — the mask-first path pays three (mask, tiles,
    idx), and on the tunnel each fetch costs a fixed ~30-40 ms RTT
    regardless of size (docs/environment-variables.md). Layout per batch
    element: bytes 0-3 = occupied-tile count (int32, host byte order via
    bitcast — same convention the CTC transfer packing relies on,
    ops/ctc.py pack_ctc_raw); then k int32 flat tile indices; then k
    64-byte tiles. With count ≤ k, scattering reproduces the bitmap
    bit-exactly (same invariant as gather_occupied_tiles); count > k
    tells the host its budget guess overflowed → full-fetch fallback."""
    b, h, w8 = packed.shape
    nth, ntw = h // DET_TILE_H, w8 // DET_TILE_W8
    nt = nth * ntw
    tile_b = DET_TILE_H * DET_TILE_W8
    t = (packed.reshape(b, nth, DET_TILE_H, ntw, DET_TILE_W8)
         .transpose(0, 1, 3, 2, 4)
         .reshape(b, nt, tile_b))
    occ = jnp.any(t != 0, axis=-1)                  # (B, nt)
    count = jnp.sum(occ, axis=-1).astype(jnp.int32)[:, None]    # (B, 1)
    score = occ.astype(jnp.int32) * (2 * nt) - jnp.arange(
        nt, dtype=jnp.int32)[None, :]
    _, idx = jax.lax.top_k(score, k)                # occupied first, asc
    tiles = jnp.take_along_axis(t, idx[:, :, None], axis=1)
    cb = jax.lax.bitcast_convert_type(count, jnp.uint8).reshape(b, 4)
    ib = jax.lax.bitcast_convert_type(
        idx.astype(jnp.int32), jnp.uint8).reshape(b, 4 * k)
    return jnp.concatenate([cb, ib, tiles.reshape(b, k * tile_b)], axis=-1)


@functools.partial(jax.jit, static_argnames=("k",))
def gather_occupied_rows(packed: jax.Array, *, k: int):
    """Gather the first ``k`` rows of each bitmap ordered
    occupied-rows-first (ascending row index within each class).
    Returns (rows (B, k, W/8) uint8, idx (B, k) int32).

    With k ≥ the page's occupied-row count this loses nothing: the extra
    gathered rows are all-zero, and scattering them back into a zeroed
    buffer reproduces the full bitmap bit-exactly (the sparse-fetch
    reassembly in models/detection/detector.py)."""
    h = packed.shape[1]
    row_any = jnp.any(packed != 0, axis=-1)         # (B, H)
    score = row_any.astype(jnp.int32) * (2 * h) - jnp.arange(
        h, dtype=jnp.int32)[None, :]
    _, idx = jax.lax.top_k(score, k)                # occupied first, asc
    rows = jnp.take_along_axis(packed, idx[:, :, None], axis=1)
    return rows, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("chunk",))
def poly_scores(prob: jax.Array, polys: jax.Array, img_idx: jax.Array,
                *, chunk: int = 4) -> jax.Array:
    """Mean probability inside arbitrary simple polygons (the POLY/seal
    path's box_score over approx_poly_dp contours, db_bitmap.rs:16-82) —
    even-odd ray casting per pixel, evaluated against the resident prob
    map so the f32 map never crosses the link.

    polys (K, P, 2): vertices padded by REPLICATING vertex 0 (zero-length
    edges contribute no crossings). K must be a multiple of ``chunk``.
    """

    b, h, w = prob.shape
    k, p, _ = polys.shape
    px = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    py = jnp.arange(h, dtype=jnp.float32)[None, :, None]

    def group(gi, acc):
        q = jax.lax.dynamic_slice(polys, (gi * chunk, 0, 0), (chunk, p, 2))
        gidx = jax.lax.dynamic_slice(img_idx, (gi * chunk,), (chunk,))
        pmap = prob[gidx]                                   # (c, H, W)
        crossings = jnp.zeros((chunk, h, w), jnp.int32)
        for e in range(p):
            x1 = q[:, e, 0][:, None, None]
            y1 = q[:, e, 1][:, None, None]
            x2 = q[:, (e + 1) % p, 0][:, None, None]
            y2 = q[:, (e + 1) % p, 1][:, None, None]
            straddles = (y1 > py) != (y2 > py)
            dy = jnp.where(jnp.abs(y2 - y1) < 1e-9, 1e-9, y2 - y1)
            xint = x1 + (py - y1) * (x2 - x1) / dy
            crossings = crossings + (straddles & (px < xint)).astype(jnp.int32)
        inside = (crossings % 2) == 1
        num = jnp.sum(jnp.where(inside, pmap, 0.0), axis=(1, 2))
        den = jnp.sum(inside, axis=(1, 2)).astype(jnp.float32)
        val = jnp.where(den > 0, num / den, 0.0)
        return jax.lax.dynamic_update_slice(acc, val, (gi * chunk,))

    acc = jnp.zeros((k,), jnp.float32)
    return jax.lax.fori_loop(0, k // chunk, group, acc)


@functools.partial(jax.jit, static_argnames=("chunk",))
def quad_scores(prob: jax.Array, quads: jax.Array, img_idx: jax.Array,
                *, chunk: int = 8) -> jax.Array:
    """Mean probability inside each convex quad (box_score_fast).

    prob (B, H, W) f32 resident on device; quads (K, 4, 2) float (x, y)
    in prob-map coordinates (pre-rounded on host for fillPoly parity);
    img_idx (K,) int32. K must be a multiple of ``chunk``. Inclusive
    half-plane tests at pixel centers; quads may wind either way.
    """

    b, h, w = prob.shape
    k = quads.shape[0]
    px = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    py = jnp.arange(h, dtype=jnp.float32)[None, :, None]

    # normalize winding via the shoelace sign
    x, y = quads[..., 0], quads[..., 1]
    area2 = jnp.sum(x * jnp.roll(y, -1, 1) - jnp.roll(x, -1, 1) * y, axis=1)
    sign = jnp.where(area2 >= 0, 1.0, -1.0)[:, None]            # (K, 1)

    def group(gi, acc):
        q = jax.lax.dynamic_slice(quads, (gi * chunk, 0, 0), (chunk, 4, 2))
        gsign = jax.lax.dynamic_slice(sign, (gi * chunk, 0), (chunk, 1))
        gidx = jax.lax.dynamic_slice(img_idx, (gi * chunk,), (chunk,))
        pmap = prob[gidx]                                       # (c, H, W)
        inside = jnp.ones((chunk, h, w), bool)
        for e in range(4):
            p0 = q[:, e]
            p1 = q[:, (e + 1) % 4]
            ex = (p1[:, 0] - p0[:, 0])[:, None, None]
            ey = (p1[:, 1] - p0[:, 1])[:, None, None]
            cross = ex * (py - p0[:, 1][:, None, None]) - \
                ey * (px - p0[:, 0][:, None, None])
            inside = inside & (cross * gsign[:, :, None] >= 0)
        num = jnp.sum(jnp.where(inside, pmap, 0.0), axis=(1, 2))
        den = jnp.sum(inside, axis=(1, 2)).astype(jnp.float32)
        val = jnp.where(den > 0, num / den, 0.0)
        return jax.lax.dynamic_update_slice(acc, val, (gi * chunk,))

    acc = jnp.zeros((k,), jnp.float32)
    return jax.lax.fori_loop(0, k // chunk, group, acc)

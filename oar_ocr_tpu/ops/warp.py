"""Batched projective sampling — the one kernel behind all image preprocessing.

TPU-native replacement for three separate CPU hot loops in the reference:
- ``get_rotate_crop_image`` per-region perspective warps
  (oar-ocr-core/src/utils/transform.rs:50, rayon rows :280),
- the CRNN resize-to-48 + pad-to-batch-width pass
  (processors/resize_recognition.rs:84-157), and
- the detector resize (processors/resize_detection.rs:243-305) +
  normalization (processors/normalization.rs:18-26) passes.

TPU-first design: every preprocessing path is "sample output pixel (x, y)
at source location M·(x, y, 1)" for some per-item 3×3 matrix M — identity
resize, quad crop, crop+rotate90+resize — composed on the host (B tiny 3×3
solves) and executed as ONE batched device pass: 4-neighbor bilinear gather
fused with per-channel normalize and validity masking. Decoded uint8 pages
are uploaded once; everything downstream of decode is a single XLA program.

The matrices map **output pixel centers to source pixel centers** in the
cv2 convention (dst x → src (x+0.5)·s − 0.5 for a pure resize), which makes
the bilinear result match cv2.INTER_LINEAR / the reference's Triangle
filter.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NormSpec:
    """Per-channel fused normalization: out = sample·alpha + beta, applied
    after optional R/B swap. (normalization.rs alpha/beta form.)"""

    alpha: Tuple[float, float, float]
    beta: Tuple[float, float, float]
    swap_rb: bool = False

    @staticmethod
    def imagenet_rgb(scale: float = 1.0 / 255.0) -> "NormSpec":
        mean = (0.485, 0.456, 0.406)
        std = (0.229, 0.224, 0.225)
        return NormSpec(
            alpha=tuple(scale / s for s in std),
            beta=tuple(-m / s for m, s in zip(mean, std)),
            swap_rb=False,
        )

    @staticmethod
    def rec_bgr() -> "NormSpec":
        """x·(2/255) − 1 in BGR order (normalization.rs:202-210)."""
        return NormSpec(alpha=(2.0 / 255.0,) * 3, beta=(-1.0,) * 3, swap_rb=True)

    @staticmethod
    def identity() -> "NormSpec":
        return NormSpec(alpha=(1.0,) * 3, beta=(0.0,) * 3, swap_rb=False)


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "norm", "out_dtype", "pad_value"))
def sample_transform(
    images_u8: jax.Array,          # (P, H, W, C) uint8 padded page batch
    mats: jax.Array,               # (B, 3, 3) f32: output px → source px
    img_idx: jax.Array,            # (B,) int32 page index per item
    valid_w: jax.Array,            # (B,) int32 valid output width
    valid_h: jax.Array,            # (B,) int32 valid output height
    *,
    out_h: int,
    out_w: int,
    norm: NormSpec,
    out_dtype=jnp.float32,
    pad_value: float = 0.0,
) -> jax.Array:
    """Projective-sample B items into a (B, out_h, out_w, C) tile.

    Pixels at y >= valid_h[b] or x >= valid_w[b] are ``pad_value``
    (bucket padding — rec callers pass the post-normalize black −1, the
    reference's PaddingStrategy::Black through x·2/255−1)."""

    p, h, w, c = images_u8.shape
    b = mats.shape[0]

    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                      # (out_h, out_w)
    gx = gx.reshape(1, -1)                             # (1, HW)
    gy = gy.reshape(1, -1)

    # Explicit multiply-add instead of einsum: matmul units run at reduced
    # (bf16) precision by default on TPU, which visibly shifts sampling
    # coordinates; the VPU form is exact f32.
    def row(i):
        m0 = mats[:, i, 0][:, None]
        m1 = mats[:, i, 1][:, None]
        m2 = mats[:, i, 2][:, None]
        return m0 * gx + m1 * gy + m2                  # (B, HW)

    sxn, syn, denom = row(0), row(1), row(2)
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    # border-clamp BEFORE floor: clamping only the integer neighbor
    # indices (the old form) made coords in (−1, 0) blend pixels 0 and 1
    # with inverted weights; clamping the coordinate yields pixel 0,
    # matching det_device._interp_weights and the separable tent path so
    # gather-warped and matmul-warped crops agree at the borders
    sx = jnp.clip(sxn / denom, 0.0, w - 1.0)
    sy = jnp.clip(syn / denom, 0.0, h - 1.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    x0i = x0.astype(jnp.int32)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = y0.astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    flat = images_u8.reshape(p * h * w, c)
    base = (img_idx[:, None] * h).astype(jnp.int32)

    def fetch(yi, xi):
        lin = (base + yi) * w + xi
        return jnp.take(flat, lin.reshape(-1), axis=0).reshape(b, -1, c)

    v00 = fetch(y0i, x0i).astype(jnp.float32)
    v01 = fetch(y0i, x1i).astype(jnp.float32)
    v10 = fetch(y1i, x0i).astype(jnp.float32)
    v11 = fetch(y1i, x1i).astype(jnp.float32)

    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    out = (top * (1.0 - fy) + bot * fy).reshape(b, out_h, out_w, c)

    if norm.swap_rb and c == 3:
        out = out[..., ::-1]
    alpha = jnp.asarray(norm.alpha, jnp.float32)
    beta = jnp.asarray(norm.beta, jnp.float32)
    out = out * alpha + beta

    col = jnp.arange(out_w, dtype=jnp.int32)[None, None, :, None]
    row = jnp.arange(out_h, dtype=jnp.int32)[None, :, None, None]
    mask = (col < valid_w[:, None, None, None]) & (row < valid_h[:, None, None, None])
    return jnp.where(mask, out, pad_value).astype(out_dtype)


def warp_crops(images_u8, mats, img_idx, valid_w, *, out_h, out_w,
               normalize=True, out_dtype=jnp.float32):
    """Recognition-crop convenience wrapper (h is always fully valid).
    Normalized tiles pad with the post-normalize black (−1), matching
    every other rec path (separable warp, separable_resize_normalize)."""
    b = mats.shape[0]
    valid_h = jnp.full((b,), out_h, jnp.int32)
    norm = NormSpec.rec_bgr() if normalize else NormSpec.identity()
    return sample_transform(images_u8, mats, img_idx, valid_w, valid_h,
                            out_h=out_h, out_w=out_w, norm=norm,
                            out_dtype=out_dtype,
                            pad_value=-1.0 if normalize else 0.0)


# ---------------- separable (matmul-only) rec-crop warp ----------------
#
# Round-1 profiling: the stage-1 native warp's HBM gather dominates the
# rec stage (~100 ms / 64-crop chunk, docs/ROADMAP.md:71-84). But every
# rec crop matrix is AFFINE (quads come from minAreaRect / min-area quads,
# so getPerspectiveTransform degenerates to affine), and the overwhelmingly
# common cases are axis-ALIGNED (horizontal text; 180° textline flips keep
# alignment) or axis-SWAPPED (the rotate270 fold for tall crops). For
# those, both reference resamples — warpPerspective to the native crop and
# the bilinear resize to (48, w) — are separable, and their composition is
# exactly the product of per-axis tent-weight matrices. The whole rec
# preprocess then collapses to TWO small matmuls per crop on the MXU with
# zero gathers: tile = (W2y·W1y) · page · (W1x·W2x)ᵀ, bit-equal (to f32
# rounding) to the two-stage chain. Slanted crops (rare) stay on the
# gather path (sample_transform).


def separable_coefs(matrix: np.ndarray, eps: float = 1e-6):
    """Classify a native-crop matrix (native px → page px) as separable.

    Returns None when not separable, else
    ``(swapped, (row_a, row_b), (col_a, col_b))`` where the page (or
    transposed-page, when ``swapped``) source coords are
    row = row_a·i + row_b for native row i and col = col_a·j + col_b for
    native col j.
    """

    m = np.asarray(matrix, np.float64)
    scale = max(np.abs(m[:2, :2]).max(), 1.0)
    if abs(m[2, 0]) > eps or abs(m[2, 1]) > eps or abs(m[2, 2] - 1.0) > eps:
        return None
    if abs(m[0, 1]) <= eps * scale and abs(m[1, 0]) <= eps * scale:
        # direct: sx = m00·j + m02, sy = m11·i + m12
        return False, (float(m[1, 1]), float(m[1, 2])), \
            (float(m[0, 0]), float(m[0, 2]))
    if abs(m[0, 0]) <= eps * scale and abs(m[1, 1]) <= eps * scale:
        # swapped (rot90 fold): sx = m01·i + m02, sy = m10·j + m12.
        # On the transposed page: row coord (pageT row = page col) =
        # m01·i + m02, col coord (pageT col = page row) = m10·j + m12.
        return True, (float(m[0, 1]), float(m[0, 2])), \
            (float(m[1, 0]), float(m[1, 2]))
    return None


def band_origin(row_coef, nat_h_valid: int, src_h: int,
                band_h: int) -> int:
    """Host-side: first page row of the ``band_h``-row band that covers a
    crop's sampled rows (min source row − 1 margin, clamped so the band
    stays inside the page)."""

    a, b = float(row_coef[0]), float(row_coef[1])
    lo = min(b, a * (nat_h_valid - 1) + b) - 1.0
    return int(np.clip(np.floor(lo), 0, max(src_h - band_h, 0)))


def _batched_affine_tent(n_out: int, src_len: int, a, b, lo, hi, offset):
    """(B, n_out, src_len) tent weights; a/b/lo/hi/offset are (B,)."""
    i = jnp.arange(n_out, dtype=jnp.float32)[None, :]            # (1, No)
    pos = jnp.clip(a[:, None] * i + b[:, None], lo[:, None], hi[:, None])
    pos = pos - offset[:, None]                                  # (B, No)
    s = jnp.arange(src_len, dtype=jnp.float32)[None, None, :]    # (1, 1, S)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - s))


def _batched_resize_tent(n_out: int, src_bucket: int, dst_valid,
                         src_valid, out_valid):
    """(B, n_out, src_bucket) stage-2 weights (cv2 half-pixel, valid-extent
    clamp, zero beyond valid output)."""
    o = jnp.arange(n_out, dtype=jnp.float32)[None, :]            # (1, No)
    scale = (src_valid / dst_valid)[:, None]
    pos = jnp.clip((o + 0.5) * scale - 0.5, 0.0,
                   src_valid[:, None] - 1.0)                     # (B, No)
    s = jnp.arange(src_bucket, dtype=jnp.float32)[None, None, :]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - s))
    return jnp.where(o[..., None] < out_valid[:, None, None], w, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "nat_h_bucket", "nat_w_bucket",
                     "band_h", "norm", "out_dtype"))
def warp_rec_tiles_separable(
    src_pages: jax.Array,      # (P, SH, SW, C) uint8 pages (or transposed
                               # pages for the axis-swapped crop group)
    row_coef: jax.Array,       # (B, 2) f32 (a, b): src row = a·i + b
    col_coef: jax.Array,       # (B, 2) f32
    img_idx: jax.Array,        # (B,) int32
    band_y0: jax.Array,        # (B,) int32 band origin (band_origin())
    nat_h: jax.Array,          # (B,) int32 valid native crop dims
    nat_w: jax.Array,
    dst_w: jax.Array,          # (B,) int32 valid output width (≤ out_w)
    *,
    out_h: int,
    out_w: int,
    nat_h_bucket: int,
    nat_w_bucket: int,
    band_h: int,
    norm: NormSpec,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Composed two-resample rec preprocess for separable crops, fully
    batched: tile_b = (W2y·W1y)_b · band_b · (W1x·W2x)_bᵀ — the exact
    warp→resize chain (transform.rs:148 + resize_recognition.rs) as
    batched MXU matmuls with fused normalize + padding mask. The only
    per-crop memory op is one contiguous ``band_h``-row slice of the
    page (vmapped dynamic_slice → windowed DMA); there is no HBM gather
    and no scan."""

    p, sh, sw, c = src_pages.shape
    bh = min(band_h, sh)
    hp = jax.lax.Precision.HIGHEST

    bands = jax.vmap(
        lambda idx, y0: jax.lax.dynamic_slice(
            src_pages, (idx, y0, 0, 0), (1, bh, sw, c))[0]
    )(img_idx, band_y0)                                  # (B, bh, SW, C)

    zeros = jnp.zeros_like(band_y0, jnp.float32)
    y0f = band_y0.astype(jnp.float32)
    nhf = nat_h.astype(jnp.float32)
    nwf = nat_w.astype(jnp.float32)
    dwf = dst_w.astype(jnp.float32)
    full = jnp.full_like(y0f, float(out_h))

    w1y = _batched_affine_tent(nat_h_bucket, bh, row_coef[:, 0],
                               row_coef[:, 1], zeros,
                               zeros + float(sh - 1), y0f)
    w2y = _batched_resize_tent(out_h, nat_h_bucket, full, nhf, full)
    wy = jnp.einsum("bon,bns->bos", w2y, w1y,
                    precision=hp)                        # (B, Ho, bh)
    w1x = _batched_affine_tent(nat_w_bucket, sw, col_coef[:, 0],
                               col_coef[:, 1], zeros,
                               zeros + float(sw - 1), zeros)
    w2x = _batched_resize_tent(out_w, nat_w_bucket, dwf, nwf, dwf)
    wx = jnp.einsum("bon,bns->bos", w2x, w1x,
                    precision=hp)                        # (B, Wo, SW)

    img = bands.astype(jnp.float32)
    t = jnp.einsum("bos,bswc->bowc", wy, img, precision=hp)
    tiles = jnp.einsum("bowc,bvw->bovc", t, wx,
                       precision=hp)                     # (B, Ho, Wo, C)

    if norm.swap_rb and c == 3:
        tiles = tiles[..., ::-1]
    alpha = jnp.asarray(norm.alpha, jnp.float32)
    beta = jnp.asarray(norm.beta, jnp.float32)
    tiles = tiles * alpha + beta
    col = jnp.arange(out_w, dtype=jnp.int32)[None, None, :, None]
    # pad = black pixel through the norm (0·α + β): the reference pads
    # rec tiles in IMAGE space before normalizing (utils/image.rs:588,
    # PaddingStrategy::Black), so the padded region is β, not 0
    tiles = jnp.where(col < dst_w[:, None, None, None], tiles, beta)
    return tiles.astype(out_dtype)


# ------------------------- host-side matrix builders -------------------------

def resize_matrix(src_h: int, src_w: int, dst_h: int, dst_w: int) -> np.ndarray:
    """Affine matrix for a pure resize in cv2's half-pixel convention:
    src = (dst + 0.5)·(src_size/dst_size) − 0.5."""

    sx = src_w / float(dst_w)
    sy = src_h / float(dst_h)
    return np.array(
        [[sx, 0.0, 0.5 * sx - 0.5],
         [0.0, sy, 0.5 * sy - 0.5],
         [0.0, 0.0, 1.0]], np.float32)


def crop_geometry(quad: np.ndarray) -> Tuple[int, int, bool]:
    """(crop_w, crop_h, rotate90) for a TL,TR,BR,BL quad.

    transform.rs:120-127: crop size = rounded max opposite-edge lengths;
    :155-165: rotate 90° CCW (image-rs rotate270) when h ≥ 1.5·w.
    """

    q = np.asarray(quad, np.float32).reshape(4, 2)
    cw = int(round(max(np.linalg.norm(q[0] - q[1]), np.linalg.norm(q[2] - q[3]))))
    ch = int(round(max(np.linalg.norm(q[0] - q[3]), np.linalg.norm(q[1] - q[2]))))
    cw, ch = max(cw, 1), max(ch, 1)
    return cw, ch, ch >= cw * 1.5


def _native_crop_matrix_f64(quad: np.ndarray
                            ) -> Tuple[np.ndarray, int, int, bool]:
    """f64 matrix mapping NATIVE-resolution crop pixels → source pixels
    with the tall-crop rotation folded in: the ONE home of the
    parity-critical pts_std (full W/H corners, PaddleX convention) /
    perspective-solve / rotate270 (cw−1 translation) block. Returns
    (matrix_f64, rw, rh, rotated)."""

    import cv2

    quad = np.asarray(quad, np.float32).reshape(4, 2)
    cw, ch, rot = crop_geometry(quad)
    pts_std = np.array([[0, 0], [cw, 0], [cw, ch], [0, ch]], np.float32)
    m1 = cv2.getPerspectiveTransform(pts_std, quad)
    if rot:
        # 90° CCW: rotated image (W', H') = (ch, cw);
        # rotated (x, y) → crop (cw − 1 − y, x).
        r = np.array([[0.0, -1.0, cw - 1.0],
                      [1.0, 0.0, 0.0],
                      [0.0, 0.0, 1.0]], np.float64)
        return m1 @ r, ch, cw, True
    return m1, cw, ch, False


def build_native_crop_matrix(quad: np.ndarray) -> Tuple[np.ndarray, int, int]:
    """Matrix mapping NATIVE-resolution crop pixels → source pixels, with
    the tall-crop rotation folded in. Returns (matrix, rw, rh) where
    (rw, rh) is the crop size after rotation.

    Used by the two-stage rec preprocess: gather-warp at native resolution
    (exactly the reference's warpPerspective to (crop_w, crop_h),
    transform.rs:136-148), then resize separably on the MXU — matching the
    reference's warp-then-resize pipeline operation-for-operation while
    gathering ~3× fewer samples than a fused full-resolution warp.
    """

    m1, rw, rh, _ = _native_crop_matrix_f64(quad)
    return m1.astype(np.float32), rw, rh


def build_rec_crop_matrix(quad: np.ndarray, dst_w: int, dst_h: int) -> Tuple[np.ndarray, bool]:
    """Matrix mapping (dst_h, dst_w) recognizer-tile pixels → source pixels.

    Exact composition of the reference chain: perspective warp of ``quad``
    to its (crop_w, crop_h) rectangle with pts_std corners at full W/H
    (transform.rs:136-142 — PaddleX convention, not W−1), optional 90° CCW
    rotation for tall crops (rotate270, transform.rs:163), then the
    half-pixel bilinear resize to the recognizer tile
    (resize_recognition.rs / image-rs resize_exact Triangle).

    Returns (matrix, rotated).
    """

    # composed on the shared f64 native matrix (the parity-critical
    # pts_std / perspective-solve / rotate270 block lives in ONE place);
    # full f64 through the product, one final f32 cast as before
    m1, rw, rh, rot = _native_crop_matrix_f64(quad)
    m2 = resize_matrix(rh, rw, dst_h, dst_w).astype(np.float64)
    return (m1 @ m2).astype(np.float32), rot

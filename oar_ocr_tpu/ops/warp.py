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
    jax.jit, static_argnames=("out_h", "out_w", "norm", "out_dtype"))
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
) -> jax.Array:
    """Projective-sample B items into a (B, out_h, out_w, C) tile.

    Pixels at y >= valid_h[b] or x >= valid_w[b] are zero (bucket padding).
    """

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
    sx = sxn / denom
    sy = syn / denom

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
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
    return jnp.where(mask, out, 0.0).astype(out_dtype)


def warp_crops(images_u8, mats, img_idx, valid_w, *, out_h, out_w,
               normalize=True, out_dtype=jnp.float32):
    """Recognition-crop convenience wrapper (h is always fully valid)."""
    b = mats.shape[0]
    valid_h = jnp.full((b,), out_h, jnp.int32)
    norm = NormSpec.rec_bgr() if normalize else NormSpec.identity()
    return sample_transform(images_u8, mats, img_idx, valid_w, valid_h,
                            out_h=out_h, out_w=out_w, norm=norm,
                            out_dtype=out_dtype)


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

    import cv2

    quad = np.asarray(quad, np.float32).reshape(4, 2)
    cw, ch, rot = crop_geometry(quad)
    pts_std = np.array([[0, 0], [cw, 0], [cw, ch], [0, ch]], np.float32)
    m1 = cv2.getPerspectiveTransform(pts_std, quad)
    if rot:
        r = np.array([[0.0, -1.0, cw - 1.0],
                      [1.0, 0.0, 0.0],
                      [0.0, 0.0, 1.0]], np.float64)
        m1 = m1 @ r
        return m1.astype(np.float32), ch, cw
    return m1.astype(np.float32), cw, ch


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

    import cv2

    quad = np.asarray(quad, np.float32).reshape(4, 2)
    cw, ch, rot = crop_geometry(quad)
    pts_std = np.array([[0, 0], [cw, 0], [cw, ch], [0, ch]], np.float32)
    m1 = cv2.getPerspectiveTransform(pts_std, quad)  # crop px → src px
    if rot:
        # 90° CCW: rotated image (W', H') = (ch, cw);
        # rotated (x, y) → crop (cw − 1 − y, x).
        r = np.array([[0.0, -1.0, cw - 1.0],
                      [1.0, 0.0, 0.0],
                      [0.0, 0.0, 1.0]], np.float64)
        m1 = m1 @ r
        rw, rh = ch, cw
    else:
        rw, rh = cw, ch
    m2 = resize_matrix(rh, rw, dst_h, dst_w).astype(np.float64)
    return (m1 @ m2).astype(np.float32), rot

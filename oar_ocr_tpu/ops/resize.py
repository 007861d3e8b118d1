"""Detector / recognizer resize planning and execution.

Re-expresses ``DetResizeForTest`` (reference: oar-ocr-core/src/processors/
resize_detection.rs:31-320) and ``OCRResize`` (resize_recognition.rs:19-157).

Split TPU-first into:
- **planning** (host, pure integer math): target shapes, ratios, bucket
  selection — exact reference semantics, unit-tested;
- **execution**: host cv2 INTER_LINEAR resize (the reference emulates
  cv2.resize INTER_LINEAR with image-rs Triangle — resize_detection.rs:100
  comment — so cv2 here is the *primary* parity target, not an
  approximation), feeding bucket-padded uint8 batches to the device, where
  normalization runs fused (ops/normalize.py). Recognition crops never pass
  through here — they are warped directly on device (ops/warp.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import cv2
import numpy as np

from ..core.constants import (DET_LIMIT_SIDE_LEN, DET_MAX_SIDE_LEN,
                              REC_IMAGE_SHAPE, REC_MAX_WIDTH)
from ..core.types import ImageScaleInfo, LimitType


@dataclass(frozen=True)
class DetResizeConfig:
    """Type0 resize parameters (resize_detection.rs:63-105)."""

    limit_side_len: int = DET_LIMIT_SIDE_LEN
    limit_type: LimitType = LimitType.MAX
    max_side_limit: int = DET_MAX_SIDE_LEN


def det_target_size(h: int, w: int, cfg: DetResizeConfig) -> Tuple[int, int]:
    """Target (h, w) for Type0 det resize — exact reference math
    (resize_image_type0, resize_detection.rs:243-305): ratio by limit type,
    max-side clamp, then round-to-nearest multiple of 32 via (x+16)//32*32
    with a 32 floor."""

    # Small-image padding handled by caller (pad_small_image).
    # All ratio math in f32 (np.float32), matching the reference's
    # `limit as f32 / side as f32` + `(side as f32 * ratio) as u32`
    # truncations — f64 can differ by 1 px near integer boundaries,
    # which the +16 rounding then amplifies to a whole 32-px bucket.
    f32 = np.float32
    lt = cfg.limit_type
    if lt == LimitType.MAX:
        ratio = (f32(cfg.limit_side_len) / f32(max(h, w))
                 if max(h, w) > cfg.limit_side_len else f32(1.0))
    elif lt == LimitType.MIN:
        ratio = (f32(cfg.limit_side_len) / f32(min(h, w))
                 if min(h, w) < cfg.limit_side_len else f32(1.0))
    else:  # RESIZE_LONG
        ratio = f32(cfg.limit_side_len) / f32(max(h, w))

    resize_h = int(f32(h) * ratio)
    resize_w = int(f32(w) * ratio)
    if max(resize_h, resize_w) > cfg.max_side_limit:
        lr = f32(cfg.max_side_limit) / f32(max(resize_h, resize_w))
        resize_h = int(f32(resize_h) * lr)
        resize_w = int(f32(resize_w) * lr)
    resize_h = max((resize_h + 16) // 32 * 32, 32)
    resize_w = max((resize_w + 16) // 32 * 32, 32)
    return resize_h, resize_w


def pad_small_image(img: np.ndarray) -> np.ndarray:
    """Pad images with h+w < 64 to at least 32×32 with black
    (resize_detection.rs:171-220)."""

    h, w = img.shape[:2]
    if h + w >= 64:
        return img
    nh, nw = max(h, 32), max(w, 32)
    out = np.zeros((nh, nw) + img.shape[2:], dtype=img.dtype)
    out[:h, :w] = img
    return out


def det_resize(img: np.ndarray, cfg: DetResizeConfig) -> Tuple[np.ndarray, ImageScaleInfo]:
    """Resize one HWC uint8 image for detection; returns image + scale info."""

    img = pad_small_image(img)
    h, w = img.shape[:2]
    th, tw = det_target_size(h, w, cfg)
    if (th, tw) == (h, w):
        return img, ImageScaleInfo(h, w, h, w)
    resized = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
    return resized, ImageScaleInfo(h, w, th, tw)


# ----------------------------- recognition -----------------------------

def rec_crop_width(crop_w: int, crop_h: int, *, target_h: int = REC_IMAGE_SHAPE[1],
                   max_width: int = REC_MAX_WIDTH) -> int:
    """Per-crop resized width at the canonical height.

    resize_recognition.rs:84-114: w_i = ceil(target_h * wh_ratio), clamped to
    the cap (3200, constants.rs:8)."""

    ratio = crop_w / float(crop_h) if crop_h > 0 else 1.0
    return max(1, min(int(math.ceil(target_h * ratio)), max_width))


def rec_batch_width(widths: Sequence[int], *, max_width: int = REC_MAX_WIDTH) -> int:
    """Batch tile width = max of member widths (the reference pads each chunk
    to its max wh_ratio width, resize_recognition.rs:84-157)."""

    return min(max(widths), max_width) if widths else REC_IMAGE_SHAPE[2]

"""VLM image processing: smart resize and patch-grid planning.

Re-expresses oar-ocr-vl/src/utils/image.rs:177-240 ``smart_resize`` (round
H/W to multiples of factor = patch_size·merge_size; shrink if area >
max_pixels by sqrt(HW/max) flooring to factor; grow if < min_pixels
ceiling to factor; reject aspect ratio > 200) and the image-token count
rule t·h·w/merge² (paddleocr_vl/model.rs:307-309).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

from ..errors import InvalidInputError


@dataclass(frozen=True)
class VisionProcessorConfig:
    patch_size: int = 14
    merge_size: int = 2
    min_pixels: int = 56 * 56
    max_pixels: int = 28 * 28 * 1280

    @property
    def factor(self) -> int:
        return self.patch_size * self.merge_size


def smart_resize(h: int, w: int, cfg: VisionProcessorConfig
                 ) -> Tuple[int, int]:
    """Target (h, w) for the vision encoder (utils/image.rs:177)."""

    if max(h, w) / max(min(h, w), 1) > 200:
        raise InvalidInputError("aspect ratio > 200 unsupported",
                                h=h, w=w)
    factor = cfg.factor
    hb = max(factor, round(h / factor) * factor)
    wb = max(factor, round(w / factor) * factor)
    if hb * wb > cfg.max_pixels:
        beta = math.sqrt((h * w) / cfg.max_pixels)
        hb = max(factor, math.floor(h / beta / factor) * factor)
        wb = max(factor, math.floor(w / beta / factor) * factor)
    elif hb * wb < cfg.min_pixels:
        beta = math.sqrt(cfg.min_pixels / (h * w))
        hb = math.ceil(h * beta / factor) * factor
        wb = math.ceil(w * beta / factor) * factor
    return hb, wb


def smart_resize_token_limited(h: int, w: int, cfg: VisionProcessorConfig,
                               max_tokens: int) -> Tuple[int, int]:
    """HunyuanOCR V1 resize (hunyuanocr/processing.rs:16-62):
    smart_resize, then shrink the larger merged-grid axis one factor at a
    time until ``Hm·(Wm+1) ≤ max_tokens`` (the +1 is HunYuanVL's
    per-row newline token)."""
    rh, rw = smart_resize(h, w, cfg)
    factor = cfg.factor
    while True:
        hm, wm = rh // factor, rw // factor
        if hm * (wm + 1) <= max_tokens:
            return rh, rw
        if wm >= hm:
            if rw <= factor:
                raise InvalidInputError(
                    "cannot satisfy img_max_token_num", h=h, w=w,
                    max_tokens=max_tokens)
            rw -= factor
        else:
            if rh <= factor:
                raise InvalidInputError(
                    "cannot satisfy img_max_token_num", h=h, w=w,
                    max_tokens=max_tokens)
            rh -= factor


def clamp_to_max_image_size(h: int, w: int, factor: int,
                            max_image_size: int) -> Tuple[int, int]:
    """Scale (h, w) down so the longer side fits ``max_image_size``,
    flooring to factor multiples with a factor floor
    (oar-ocr-vl/src/utils/image.rs:256-305)."""
    if factor <= 0 or max_image_size < factor:
        raise InvalidInputError("bad clamp config", factor=factor,
                                max_image_size=max_image_size)
    if max(h, w) <= max_image_size:
        return h, w
    scale = max_image_size / max(h, w)
    nh = int(math.floor(h * scale / factor) * factor)
    nw = int(math.floor(w * scale / factor) * factor)
    return max(nh, factor), max(nw, factor)


# Spotting preprocess constants (paddleocr_vl/model.rs:55-56)
SPOTTING_UPSCALE_THRESHOLD = 1500
SPOTTING_MAX_LONG_SIDE = 2048


def spotting_preprocess_plan(h: int, w: int, cfg: VisionProcessorConfig
                             ) -> Tuple[Tuple[int, int],
                                        VisionProcessorConfig]:
    """The Spotting task's preprocess deltas (paddleocr_vl/model.rs:255-295):

    - when BOTH sides are under SPOTTING_UPSCALE_THRESHOLD the image is
      first upscaled 2× (Lanczos — the official spotting script hardcodes
      it regardless of the processor resample, model.rs:258-262);
    - max_pixels is raised to max(cfg.max_pixels,
      SPOTTING_MAX_LONG_SIDE·factor²) (model.rs:285-292).

    Returns ((pre-resize h, w), the widened config). The caller resizes
    to the returned size, then runs the normal ``smart_resize`` chain.
    """
    import dataclasses

    if h < SPOTTING_UPSCALE_THRESHOLD and w < SPOTTING_UPSCALE_THRESHOLD:
        h, w = h * 2, w * 2
    factor = cfg.factor
    widened = dataclasses.replace(cfg, max_pixels=max(
        cfg.max_pixels, SPOTTING_MAX_LONG_SIDE * factor * factor))
    return (h, w), widened


def grid_shape(h: int, w: int, cfg: VisionProcessorConfig) -> Tuple[int, int]:
    """Patch grid (gh, gw) at patch_size granularity."""
    return h // cfg.patch_size, w // cfg.patch_size


def num_image_tokens(h: int, w: int, cfg: VisionProcessorConfig) -> int:
    """Token count after 2×2 merge (model.rs:307-309)."""
    gh, gw = grid_shape(h, w, cfg)
    return (gh * gw) // (cfg.merge_size ** 2)

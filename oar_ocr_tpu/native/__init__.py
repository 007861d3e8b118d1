"""Native host-postprocess bindings (C++ CPython extension).

The reference's host runtime is native Rust; here the hot host loop —
packed-bitmap → DB candidate quads (unpack + connected components +
convex hull + rotating-calipers min-area rect) — is a C++ extension
(native/db_candidates.cpp), auto-built on first import with a pure-Python
fallback (processors/db_postprocess.py) and an OAR_TPU_NO_NATIVE kill
switch.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys
from typing import List, Optional, Tuple

import numpy as np

_native = None
_tried = False

_REPO_NATIVE = pathlib.Path(__file__).resolve().parents[2] / "native"


def _build() -> None:
    subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=str(_REPO_NATIVE), check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def _load():
    global _native, _tried
    if _tried:
        return _native
    _tried = True
    if os.environ.get("OAR_TPU_NO_NATIVE"):
        return None
    if str(_REPO_NATIVE) not in sys.path:
        sys.path.insert(0, str(_REPO_NATIVE))
    # rebuild a stale binary BEFORE first import (an already-imported C
    # extension cannot be reloaded in-process)
    try:
        so = next(_REPO_NATIVE.glob("oar_native*.so"), None)
        srcs = list(_REPO_NATIVE.glob("*.cpp")) + [_REPO_NATIVE / "setup.py"]
        if so is not None and so.stat().st_mtime < max(
                s.stat().st_mtime for s in srcs if s.exists()):
            _build()
    except Exception:
        pass
    try:
        import oar_native  # type: ignore

        _native = oar_native
    except ImportError:
        try:
            _build()
            import oar_native  # type: ignore

            _native = oar_native
        except Exception:
            _native = None
    return _native


def available() -> bool:
    return _load() is not None


def db_candidates(packed: np.ndarray, height: int, width: int,
                  min_size: float, max_candidates: int
                  ) -> Optional[List[Tuple[np.ndarray, float]]]:
    """Packed (H, W/8) uint8 bitmap → [(quad (4,2), min_side)], or None
    when the native module is unavailable (caller falls back)."""

    mod = _load()
    if mod is None:
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    out = mod.db_candidates(packed.tobytes(), int(height), int(width),
                            int(packed.shape[1]), float(min_size),
                            int(max_candidates))
    return [(np.array(t[:8], np.float32).reshape(4, 2), float(t[8]))
            for t in out]


def finalize_quads(minis: np.ndarray, unclip_ratio: float, min_size: float,
                   width_scale: float, height_scale: float,
                   dest_w: int, dest_h: int) -> Optional[np.ndarray]:
    """Batched score-independent finalize of (N, 4, 2) f32 mini-boxes
    (unclip → expand → re-min-area-rect → order → scale+round+clamp) →
    (N, 9) f32: 8 ordered coords + valid flag. None when the native
    module is unavailable or predates this entry point (caller falls
    back to the per-quad Python path)."""
    mod = _load()
    if mod is None or not hasattr(mod, "finalize_quads"):
        return None
    minis = np.ascontiguousarray(minis, np.float32)
    n = int(minis.shape[0])
    out = mod.finalize_quads(minis.tobytes(), n, float(unclip_ratio),
                             float(min_size), float(width_scale),
                             float(height_scale), int(dest_w), int(dest_h))
    return np.frombuffer(out, np.float32).reshape(n, 9)


def _page_args(images):
    pages = tuple(np.ascontiguousarray(im, np.uint8) for im in images)
    hs = tuple(int(p.shape[0]) for p in pages)
    ws = tuple(int(p.shape[1]) for p in pages)
    return pages, hs, ws


def analyze_pages(images, target_h: int, target_w: int, tile: int
                  ) -> Optional[Tuple[bool, np.ndarray, np.ndarray]]:
    """One-pass page-upload analysis (native/page_tiles.cpp): returns
    (all_gray, per-tile minima (B, nth, ntw, 3) uint8, occupancy
    (B, nth, ntw) bool) over the zero-padded tile grid, or None when the
    native module is unavailable (caller falls back to the NumPy path)."""
    mod = _load()
    if mod is None or not hasattr(mod, "analyze_pages"):
        return None
    pages, hs, ws = _page_args(images)
    gray, base_b, occ_b = mod.analyze_pages(
        pages, hs, ws, int(target_h), int(target_w), int(tile))
    nth, ntw = target_h // tile, target_w // tile
    b = len(pages)
    base = np.frombuffer(base_b, np.uint8).reshape(b, nth, ntw, 3)
    occ = np.frombuffer(occ_b, np.uint8).reshape(b, nth, ntw).astype(bool)
    return bool(gray), base, occ


def gather_tiles(images, target_h: int, target_w: int, tile: int,
                 idx: np.ndarray, gray: bool) -> Optional[np.ndarray]:
    """Copy the tiles at flat indices ``idx`` ((b·nth+ti)·ntw+tj) out of
    the (conceptually padded) page batch → (N, tile, tile, C) uint8."""
    mod = _load()
    if mod is None or not hasattr(mod, "gather_tiles"):
        return None
    pages, hs, ws = _page_args(images)
    idx = np.ascontiguousarray(idx, np.int32)
    out = mod.gather_tiles(pages, hs, ws, int(target_h), int(target_w),
                           int(tile), idx.tobytes(), int(gray))
    c = 1 if gray else 3
    return np.frombuffer(out, np.uint8).reshape(len(idx), tile, tile, c)


def stack_pages(images, target_h: int, target_w: int, gray: bool
                ) -> Optional[np.ndarray]:
    """Zero-padded (B, H, W, C) stack; C=1 keeps channel 0 (gray pages)."""
    mod = _load()
    if mod is None or not hasattr(mod, "stack_pages"):
        return None
    pages, hs, ws = _page_args(images)
    out = mod.stack_pages(pages, hs, ws, int(target_h), int(target_w),
                          int(gray))
    c = 1 if gray else 3
    return np.frombuffer(out, np.uint8).reshape(
        len(pages), target_h, target_w, c)

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

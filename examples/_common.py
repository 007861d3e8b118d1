"""Shared example plumbing (the examples/utils analog).

Every example runs self-contained: pass ``--image path`` to use a real
image, or omit it to run on a generated demo page. Without converted
checkpoints the models execute with random weights — detection thresholds
are lowered (like tests/conftest and the verify recipe) so regions flow
through the full pipeline; swap in converted weights via
``tools/convert_weights.py`` for real output.

Run from the repo root:
    PYTHONPATH=. python examples/ocr.py [--image page.png] [--out out/]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("OAR_EXAMPLES_CPU"):
    # force the CPU backend BEFORE any jax backend touch (the axon
    # sitecustomize pins TPU otherwise — docs/environment-variables.md)
    import jax

    jax.config.update("jax_platforms", "cpu")


def make_demo_page(h: int = 480, w: int = 640, lines: int = 6,
                   seed: int = 0) -> np.ndarray:
    """Synthetic document page: dark text-like bars on white."""
    import cv2

    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 248, np.uint8)
    y = 40
    for i in range(lines):
        lw = int(rng.integers(w // 3, w - 80))
        cv2.rectangle(img, (40, y), (40 + lw, y + 22),
                      (int(rng.integers(0, 60)),) * 3, -1)
        y += 56
    cv2.rectangle(img, (40, y), (w - 60, min(h - 20, y + 110)),
                  (120, 120, 120), 2)   # a table/figure frame
    return img


def make_text_line(text_w: int = 320, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.full((48, text_w, 3), 255, np.uint8)
    x = 6
    while x < text_w - 18:
        wch = int(rng.integers(8, 16))
        img[12:36, x:x + wch] = int(rng.integers(0, 70))
        x += wch + 6
    return img


def parse_args(description: str, **extra):
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--image", help="input image (default: generated demo)")
    ap.add_argument("--out", default="example_out",
                    help="output directory (default: example_out/)")
    for name, kw in extra.items():
        ap.add_argument(f"--{name.replace('_', '-')}", **kw)
    return ap.parse_args()


def load_image(args, maker=make_demo_page) -> np.ndarray:
    if args.image:
        import cv2

        img = cv2.imread(args.image, cv2.IMREAD_COLOR)
        if img is None:
            raise SystemExit(f"cannot read {args.image}")
        return img[..., ::-1].copy()      # BGR → RGB
    return maker()


def out_path(args, name: str) -> str:
    os.makedirs(args.out, exist_ok=True)
    return os.path.join(args.out, name)

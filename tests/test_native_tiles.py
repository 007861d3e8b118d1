"""Native page-tile analysis (native/page_tiles.cpp) vs the NumPy path.

The sparse page upload's host analysis (runtime/page_upload.py) has two
implementations: the original NumPy expression (stack_padded + full-channel
gray compare + reshape/min/max + fancy-indexed gather) and the single-pass
C++ one. They must agree bit-for-bit — the upload reconstruction's
correctness proof (tests/test_sparse_upload.py) is written against the
NumPy semantics.
"""

import numpy as np
import pytest

from oar_ocr_tpu import native as native_mod
from oar_ocr_tpu.runtime import page_upload as pu
from oar_ocr_tpu.runtime.runtime import stack_padded

pytestmark = [
    pytest.mark.fast,
    pytest.mark.skipif(not native_mod.available(),
                       reason="native module unavailable"),
]


def _pages(rng, gray: bool, heights=None, widths=None, n=4):
    pages = []
    for i in range(n):
        h = (heights or [160] * n)[i]
        w = (widths or [224] * n)[i]
        img = np.full((h, w, 3), 255, np.uint8)
        for r in range(4):
            v = rng.integers(0, 90, size=() if gray else (3,))
            img[10 + 30 * r : 28 + 30 * r, 8 : 8 + min(w - 10, 120 + 9 * r)] = v
        pages.append(img)
    return pages


def _python_plan(pages, h, w):
    gray = pu._all_gray(pages)
    if gray:
        batch = stack_padded([im[:, :, 0] for im in pages], (h, w))
    else:
        batch = stack_padded(list(pages), (h, w))
    return gray, pu._analyze(batch)


@pytest.mark.parametrize("gray", [True, False])
@pytest.mark.parametrize("ragged", [False, True])
def test_native_plan_matches_numpy(gray, ragged):
    rng = np.random.default_rng(3)
    heights = [160, 140, 97, 31] if ragged else None
    widths = [224, 200, 111, 224] if ragged else None
    pages = _pages(rng, gray, heights, widths)
    h, w = 160, 224
    g_py, plan_py = _python_plan(pages, h, w)
    res = pu._native_plan(pages, h, w, len(pages) * h * w * 3)
    assert res is not None
    g_nat, plan_nat, batch = res
    assert g_nat == g_py
    if plan_py is None:
        assert plan_nat is None
        return
    base_py, tiles_py, idx_py, payload_py = plan_py
    base_nat, tiles_nat, idx_nat, payload_nat = plan_nat
    assert np.array_equal(np.asarray(base_py).reshape(base_nat.shape),
                          base_nat)
    assert np.array_equal(tiles_py, tiles_nat)
    assert np.array_equal(idx_py, idx_nat)
    assert payload_py == payload_nat


def test_gray_detects_single_differing_pixel():
    """The SSE gray pass must catch a lone channel mismatch at every
    alignment (block body, scalar tail, first/last pixel)."""
    for w in (224, 223, 211):
        img = np.full((50, w, 3), 77, np.uint8)
        res = native_mod.analyze_pages([img], 64, 224, 32)
        assert res[0] == 1
        for (y, x, c) in [(0, 0, 0), (49, w - 1, 2), (25, w // 2, 1),
                          (10, w - 2, 1)]:
            bad = img.copy()
            bad[y, x, c] += 1
            assert native_mod.analyze_pages([bad], 64, 224, 32)[0] == 0, (
                w, y, x, c)


def test_stack_pages_matches_stack_padded():
    rng = np.random.default_rng(7)
    pages = _pages(rng, False, [160, 140, 97, 31], [224, 200, 111, 224])
    nat = native_mod.stack_pages(pages, 192, 256, False)
    assert np.array_equal(nat, stack_padded(list(pages), (192, 256)))
    nat1 = native_mod.stack_pages(pages, 192, 256, True)
    assert np.array_equal(
        nat1, stack_padded([im[:, :, 0] for im in pages], (192, 256)))


def test_gather_tiles_matches_fancy_indexing():
    rng = np.random.default_rng(9)
    pages = _pages(rng, False, [160, 140, 97, 31], [224, 200, 111, 224])
    h, w, tile = 160, 224, 32
    batch = stack_padded(list(pages), (h, w))
    b = len(pages)
    nth, ntw = h // tile, w // tile
    t = batch.reshape(b, nth, tile, ntw, tile, 3)
    idx = np.asarray([0, 5, nth * ntw - 1, nth * ntw + 3,
                      b * nth * ntw - 1], np.int32)
    bi, rem = np.divmod(idx, nth * ntw)
    ti, tj = np.divmod(rem, ntw)
    expect = np.ascontiguousarray(t[bi, ti, :, tj, :, :])
    got = native_mod.gather_tiles(pages, h, w, tile, idx, False)
    assert np.array_equal(got, expect)


def test_upload_pages_native_sparse_bit_exact(monkeypatch):
    """End-to-end: adaptive upload through the native plan reconstructs
    the exact padded batch on device."""
    from oar_ocr_tpu.config.runtime import RuntimeConfig
    from oar_ocr_tpu.runtime.runtime import Runtime

    rng = np.random.default_rng(11)
    rt = Runtime(RuntimeConfig(page_upload="auto", use_mesh=False))
    rt._h2d_mbps = 5.0
    monkeypatch.setattr(rt, "h2d_stale", lambda s: False)
    pages = _pages(rng, True, n=2, heights=[160, 129], widths=[224, 224])
    out = np.asarray(pu.upload_pages(rt, pages, (160, 224)))
    assert np.array_equal(out, stack_padded(list(pages), (160, 224)))

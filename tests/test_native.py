"""Native C++ candidate extraction vs the pure-Python/cv2 reference path
(the SIMD==scalar parity-test discipline of the reference, simd.rs:10-14)."""

import numpy as np
import pytest

from oar_ocr_tpu import native
from oar_ocr_tpu.processors.db_postprocess import (DBPostProcess,
                                                   DBPostProcessConfig,
                                                   order_mini_box_points)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native extension not built")


def _pack(bm):
    return np.packbits(bm, axis=1)


def test_rectangle_matches_cv2_path():
    bm = np.zeros((64, 96), np.uint8)
    bm[20:32, 10:50] = 1
    nat = native.db_candidates(_pack(bm), 64, 96, 3.0, 100)
    ref = DBPostProcess(DBPostProcessConfig()).quad_candidates(bm)
    assert len(nat) == len(ref) == 1
    nat_box = order_mini_box_points(nat[0][0])
    np.testing.assert_allclose(nat_box, ref[0], atol=1.0)


def test_multiple_components():
    bm = np.zeros((64, 96), np.uint8)
    bm[5:15, 5:40] = 1
    bm[30:45, 50:90] = 1
    nat = native.db_candidates(_pack(bm), 64, 96, 3.0, 100)
    assert len(nat) == 2


def test_min_size_filter():
    bm = np.zeros((32, 32), np.uint8)
    bm[10:12, 10:12] = 1  # 2x2 blob, side < 3
    assert native.db_candidates(_pack(bm), 32, 32, 3.0, 100) == []


def test_rotated_component(rng):
    """Random rotated rectangle: native min-area rect ≈ cv2's."""
    import cv2

    bm = np.zeros((128, 128), np.uint8)
    rect = (((64, 64), (60, 20), 30))
    pts = cv2.boxPoints(rect).astype(np.int32)
    cv2.fillPoly(bm, [pts], 1)
    nat = native.db_candidates(_pack(bm), 128, 128, 3.0, 100)
    ref = DBPostProcess(DBPostProcessConfig()).quad_candidates(bm)
    assert len(nat) == len(ref) == 1
    # compare areas and short sides
    def area(q):
        x, y = q[:, 0], q[:, 1]
        return abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2
    assert area(nat[0][0]) == pytest.approx(area(ref[0]), rel=0.05)
    assert nat[0][1] == pytest.approx(20, abs=1.5)


def test_width_masking():
    """Bits beyond the valid width must be ignored."""
    bm = np.zeros((16, 16), np.uint8)
    bm[2:10, 12:16] = 1   # only valid within width=12? no: set at 12..16
    packed = _pack(bm)
    out = native.db_candidates(packed, 16, 12, 1.0, 10)
    assert out == []      # everything is beyond width 12


def test_max_candidates():
    bm = np.zeros((64, 64), np.uint8)
    for i in range(6):
        bm[i * 10 + 2 : i * 10 + 8, 2:60] = 1
    out = native.db_candidates(_pack(bm), 64, 64, 1.0, 3)
    assert len(out) == 3


def test_hole_contours_match_cv2_path():
    """A donut component: RETR_LIST (Python fallback) emits both the outer
    boundary and the interior hole; the native path must match in count
    and in raster enumeration order (ADVICE r1)."""
    bm = np.ones((64, 64), np.uint8)
    bm[:4] = bm[-4:] = bm[:, :4] = bm[:, -4:] = 0
    bm[24:40, 24:40] = 0  # interior hole
    nat = native.db_candidates(_pack(bm), 64, 64, 3.0, 100)
    ref = DBPostProcess(DBPostProcessConfig()).quad_candidates(bm)
    assert len(nat) == len(ref) == 2
    # order: outer first (anchor at top-left), hole second
    nat_areas = sorted(
        [abs(np.cross(q[1] - q[0], q[3] - q[0])) for q, _ in nat])
    ref_areas = sorted(
        [abs(np.cross(q[1] - q[0], q[3] - q[0])) for q in ref])
    np.testing.assert_allclose(nat_areas, ref_areas, rtol=0.2)
    # outer contour enumerates before the hole
    assert abs(np.cross(nat[0][0][1] - nat[0][0][0],
                        nat[0][0][3] - nat[0][0][0])) > \
           abs(np.cross(nat[1][0][1] - nat[1][0][0],
                        nat[1][0][3] - nat[1][0][0]))


def _random_minis(rng, n):
    minis = []
    for _ in range(n):
        cx, cy = rng.uniform(20, 700), rng.uniform(20, 900)
        w, h = rng.uniform(2, 400), rng.uniform(2, 40)
        th = rng.uniform(-0.6, 0.6)
        c, s = np.cos(th), np.sin(th)
        base = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                         [w / 2, h / 2], [-w / 2, h / 2]])
        rot = base @ np.array([[c, -s], [s, c]]).T + [cx, cy]
        minis.append(order_mini_box_points(
            rot.astype(np.float32)).astype(np.float32))
    return minis


def test_finalize_quads_matches_python(rng):
    """Native batched finalize (unclip→expand→minrect→order→scale) vs
    the per-quad Python/cv2 path: identical accept/reject decisions and
    coordinates within the established native-vs-cv2 tolerance."""
    pp = DBPostProcess(DBPostProcessConfig())
    minis = _random_minis(rng, 200)
    # degenerate candidates exercise the reject paths
    minis.append(np.zeros((4, 2), np.float32))
    minis.append(np.float32([[5, 5], [5.4, 5], [5.4, 5.2], [5, 5.2]]))
    ws, hs, dw, dh = 1280 / 960.0, 960 / 736.0, 1280, 960
    got = pp.finalize_quads_batch(minis, ws, hs, dw, dh)
    for mb, g in zip(minis, got):
        ref = pp.finalize_quad_geometry(mb, ws, hs, dw, dh)
        assert (g is None) == (ref is None), mb
        if ref is not None:
            np.testing.assert_allclose(g, ref, atol=1.0)


def test_finalize_quads_batch_empty_and_fallback(monkeypatch):
    pp = DBPostProcess(DBPostProcessConfig())
    assert pp.finalize_quads_batch([], 1.0, 1.0, 10, 10) == []
    # native unavailable → per-quad Python fallback, same results
    import oar_ocr_tpu.native as native_mod

    minis = _random_minis(np.random.default_rng(3), 8)
    ref = pp.finalize_quads_batch(minis, 1.5, 1.5, 2000, 2000)
    monkeypatch.setattr(native_mod, "finalize_quads",
                        lambda *a, **k: None)
    fb = pp.finalize_quads_batch(minis, 1.5, 1.5, 2000, 2000)
    for a, b in zip(ref, fb):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_allclose(a, b, atol=1.0)


def test_truncation_order_is_raster():
    """max_candidates truncation keeps the earliest candidates in raster
    order, matching the fallback's enumeration."""
    bm = np.zeros((64, 96), np.uint8)
    bm[5:15, 5:40] = 1       # top component
    bm[30:45, 50:90] = 1     # bottom component
    nat = native.db_candidates(_pack(bm), 64, 96, 3.0, 1)
    assert len(nat) == 1
    assert nat[0][0][:, 1].max() <= 16  # kept the TOP one

import numpy as np
import pytest

from oar_ocr_tpu.processors.geometry import (AABB, approx_poly_dp,
                                             boxes_iou_matrix, min_area_rect,
                                             order_quad_points, polygon_area,
                                             polygon_perimeter, quad_crop_size,
                                             rotate_points_back)


pytestmark = pytest.mark.fast


def test_order_quad_points():
    pts = np.array([[10, 0], [0, 0], [10, 5], [0, 5]], np.float32)
    out = order_quad_points(pts)
    np.testing.assert_allclose(
        out, [[0, 0], [10, 0], [10, 5], [0, 5]])


def test_order_quad_points_rotated():
    # a quad rotated ~30°: TL should still be the top-most of the left pair
    pts = np.array([[5, 0], [12, 4], [8, 10], [1, 6]], np.float32)
    out = order_quad_points(pts)
    assert out[0][0] <= out[1][0]
    assert out[3][0] <= out[2][0]


def test_min_area_rect_axis_aligned():
    pts = np.array([[0, 0], [10, 0], [10, 4], [0, 4]], np.float32)
    box, min_side = min_area_rect(pts)
    assert min_side == pytest.approx(4.0)
    assert polygon_area(box) == pytest.approx(40.0)


def test_polygon_area_perimeter():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float32)
    assert polygon_area(sq) == pytest.approx(16.0)
    assert polygon_perimeter(sq) == pytest.approx(16.0)


def test_aabb_iou():
    a = AABB(0, 0, 10, 10)
    b = AABB(5, 5, 15, 15)
    assert a.iou(b) == pytest.approx(25.0 / 175.0)
    assert a.ioa(b) == pytest.approx(0.25)
    assert a.iou(AABB(20, 20, 30, 30)) == 0.0


def test_boxes_iou_matrix():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    m = boxes_iou_matrix(a, b)
    np.testing.assert_allclose(m[0], [1.0, 25.0 / 175.0, 0.0], atol=1e-6)


@pytest.mark.parametrize("deg", [0, 90, 180, 270])
def test_rotate_points_back_roundtrip(deg):
    # Rotating an image by `deg` CCW maps original (x,y) into the rotated
    # frame; rotate_points_back must invert that mapping.
    w0, h0 = 100, 60  # original image size
    pts0 = np.array([[10, 20], [90, 50]], np.float32)
    if deg == 0:
        rot, rw, rh = pts0, w0, h0
    elif deg == 90:
        rot = np.stack([pts0[:, 1], w0 - pts0[:, 0]], axis=1)
        rw, rh = h0, w0
    elif deg == 180:
        rot = np.stack([w0 - pts0[:, 0], h0 - pts0[:, 1]], axis=1)
        rw, rh = w0, h0
    else:
        rot = np.stack([h0 - pts0[:, 1], pts0[:, 0]], axis=1)
        rw, rh = h0, w0
    back = rotate_points_back(rot, deg, rw, rh)
    np.testing.assert_allclose(back, pts0, atol=1e-4)


def test_quad_crop_size():
    quad = np.array([[0, 0], [100, 0], [100, 30], [0, 30]], np.float32)
    assert quad_crop_size(quad) == (100, 30)


def test_approx_poly_dp_simplifies():
    # many points on a square boundary reduce to ~4 corners
    t = np.linspace(0, 1, 25)[:-1]
    edges = []
    for (x0, y0), (x1, y1) in [((0, 0), (10, 0)), ((10, 0), (10, 10)),
                               ((10, 10), (0, 10)), ((0, 10), (0, 0))]:
        edges.append(np.stack([x0 + (x1 - x0) * t, y0 + (y1 - y0) * t], 1))
    poly = np.concatenate(edges)
    out = approx_poly_dp(poly, 0.5)
    assert len(out) <= 6

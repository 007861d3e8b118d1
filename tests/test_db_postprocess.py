import numpy as np
import pytest

from oar_ocr_tpu.core.types import BoxType, ScoreMode
from oar_ocr_tpu.processors.db_postprocess import (DBPostProcess,
                                                   DBPostProcessConfig,
                                                   box_score, expand_rect,
                                                   get_mini_box,
                                                   order_mini_box_points,
                                                   unclip_delta,
                                                   unclip_polygon_raster)


def _prob_map_with_rect(h=160, w=240, y0=40, y1=60, x0=50, x1=150, p=0.9):
    pred = np.zeros((h, w), np.float32)
    pred[y0:y1, x0:x1] = p
    return pred


def test_order_mini_box_points():
    pts = np.array([[10, 0], [0, 0], [10, 5], [0, 5]], np.float32)
    out = order_mini_box_points(pts)
    np.testing.assert_allclose(out, [[0, 0], [10, 0], [10, 5], [0, 5]])


def test_get_mini_box_short_side():
    pts = np.array([[0, 0], [100, 0], [100, 20], [0, 20]], np.float32)
    box, side = get_mini_box(pts)
    assert side == pytest.approx(20.0)


def test_box_score_inside_rect():
    pred = _prob_map_with_rect()
    poly = np.array([[50, 40], [149, 40], [149, 59], [50, 59]], np.float32)
    assert box_score(pred, poly) == pytest.approx(0.9, abs=0.02)


def test_unclip_delta_formula():
    # 100x20 rect: area 2000, perimeter 240, ratio 2 → delta = 16.67
    quad = np.array([[0, 0], [100, 0], [100, 20], [0, 20]], np.float32)
    assert unclip_delta(quad, 2.0) == pytest.approx(2000 * 2 / 240, rel=1e-5)


def test_expand_rect_exact():
    quad = np.array([[10, 10], [110, 10], [110, 30], [10, 30]], np.float32)
    out = expand_rect(quad, 5.0)
    np.testing.assert_allclose(
        out, [[5, 5], [115, 5], [115, 35], [5, 35]], atol=1e-5)


def test_expand_rect_rotated():
    # rotate the rect 45° and make sure expansion stays orthogonal
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    R = np.array([[c, -s], [s, c]])
    quad = (np.array([[0, 0], [100, 0], [100, 20], [0, 20]]) @ R.T).astype(np.float32)
    out = expand_rect(quad, 4.0)
    box, side = get_mini_box(out)
    assert side == pytest.approx(28.0, abs=0.1)  # 20 + 2*4


def test_unclip_polygon_raster_grows():
    quad = np.array([[20, 20], [80, 20], [80, 40], [20, 40]], np.float32)
    out = unclip_polygon_raster(quad, 6.0)
    assert out is not None
    assert out[:, 0].min() <= 15 and out[:, 0].max() >= 85


class TestQuadPipeline:
    def test_detects_rectangle(self):
        pred = _prob_map_with_rect()
        bitmap = (pred > 0.3).astype(np.uint8)
        pp = DBPostProcess(DBPostProcessConfig(box_thresh=0.6, unclip_ratio=1.5))
        boxes, scores = pp(pred, bitmap, dest_w=240, dest_h=160)
        assert len(boxes) == 1
        assert scores[0] == pytest.approx(0.9, abs=0.02)
        box = boxes[0]
        # unclipped box contains the original rect
        assert box[:, 0].min() <= 50 and box[:, 0].max() >= 149
        assert box[:, 1].min() <= 40 and box[:, 1].max() >= 59

    def test_scales_to_dest(self):
        pred = _prob_map_with_rect()
        bitmap = (pred > 0.3).astype(np.uint8)
        pp = DBPostProcess(DBPostProcessConfig(box_thresh=0.6, unclip_ratio=1.5))
        boxes, _ = pp(pred, bitmap, dest_w=480, dest_h=320)
        assert boxes[0][:, 0].max() >= 290  # 2x scale

    def test_box_thresh_filters(self):
        pred = _prob_map_with_rect(p=0.5)
        bitmap = (pred > 0.3).astype(np.uint8)
        pp = DBPostProcess(DBPostProcessConfig(box_thresh=0.7))
        boxes, _ = pp(pred, bitmap, 240, 160)
        assert boxes == []

    def test_min_size_filters_tiny(self):
        pred = np.zeros((160, 240), np.float32)
        pred[50:52, 60:62] = 0.9  # 2x2 blob < min_size 3
        bitmap = (pred > 0.3).astype(np.uint8)
        pp = DBPostProcess(DBPostProcessConfig(box_thresh=0.5))
        boxes, _ = pp(pred, bitmap, 240, 160)
        assert boxes == []

    def test_multiple_regions(self):
        pred = np.zeros((160, 240), np.float32)
        pred[20:40, 20:100] = 0.8
        pred[80:100, 120:220] = 0.8
        bitmap = (pred > 0.3).astype(np.uint8)
        pp = DBPostProcess(DBPostProcessConfig(box_thresh=0.5, unclip_ratio=1.5))
        boxes, scores = pp(pred, bitmap, 240, 160)
        assert len(boxes) == 2

    def test_valid_crop(self):
        """Bucket padding area must not produce boxes."""
        pred = np.zeros((192, 256), np.float32)
        pred[20:40, 20:100] = 0.8    # real region
        pred[170:190, 10:200] = 0.9  # inside padding
        bitmap = (pred > 0.3).astype(np.uint8)
        pp = DBPostProcess(DBPostProcessConfig(box_thresh=0.5, unclip_ratio=1.5))
        boxes, _ = pp(pred, bitmap, 240, 160, valid_h=160, valid_w=240)
        assert len(boxes) == 1


class TestPolyPipeline:
    def test_poly_path(self):
        pred = _prob_map_with_rect()
        bitmap = (pred > 0.3).astype(np.uint8)
        pp = DBPostProcess(DBPostProcessConfig(
            box_thresh=0.5, unclip_ratio=1.5, box_type=BoxType.POLY))
        boxes, scores = pp(pred, bitmap, 240, 160)
        assert len(boxes) == 1
        assert boxes[0].shape[1] == 2 and len(boxes[0]) >= 4


def test_device_quad_scores_match_host_box_score(rng):
    """ops/det_device.quad_scores (device half-plane scoring) vs the host
    box_score (cv2 fillPoly scanline) on random maps and rotated quads."""
    import cv2
    import jax.numpy as jnp

    from oar_ocr_tpu.ops.det_device import quad_scores

    pred = rng.random((2, 96, 128)).astype(np.float32)
    quads, idxs, host_scores = [], [], []
    for k in range(8):
        cx, cy = rng.uniform(30, 98), rng.uniform(30, 66)
        w, h = rng.uniform(20, 50), rng.uniform(10, 24)
        ang = rng.uniform(-60, 60)
        box = cv2.boxPoints(((cx, cy), (w, h), ang))
        img_i = k % 2
        q = np.round(box)
        q[:, 0] = np.clip(q[:, 0], 0, 127)
        q[:, 1] = np.clip(q[:, 1], 0, 95)
        quads.append(q.astype(np.float32))
        idxs.append(img_i)
        host_scores.append(box_score(pred[img_i], q))
    dev = np.asarray(quad_scores(
        jnp.asarray(pred), jnp.asarray(np.stack(quads)),
        jnp.asarray(np.asarray(idxs, np.int32)), chunk=8))
    # rasterization differs only on boundary pixels → scores agree closely
    np.testing.assert_allclose(dev, host_scores, atol=0.03)


def test_device_poly_scores_match_host(rng):
    """poly_scores (ray-casting on device) vs host box_score on simplified
    contours (incl. a concave polygon)."""
    import jax.numpy as jnp

    from oar_ocr_tpu.ops.det_device import poly_scores

    pred = rng.random((1, 96, 128)).astype(np.float32)
    # concave "L" polygon + a convex quad, padded with vertex 0
    l_poly = np.array([[10, 10], [60, 10], [60, 30], [35, 30],
                       [35, 60], [10, 60]], np.float32)
    quad = np.array([[70, 40], [120, 40], [120, 80], [70, 80]], np.float32)
    pv = 32
    polys = np.zeros((4, pv, 2), np.float32)
    for i, a in enumerate([l_poly, quad]):
        polys[i, : len(a)] = a
        polys[i, len(a):] = a[0]
    polys[2:] = polys[0]  # pad batch to chunk multiple
    dev = np.asarray(poly_scores(jnp.asarray(pred), jnp.asarray(polys),
                                 jnp.zeros(4, jnp.int32)))
    host = [box_score(pred[0], l_poly), box_score(pred[0], quad)]
    np.testing.assert_allclose(dev[:2], host, atol=0.04)


def test_poly_path_device_scoring():
    """The seal/poly detector path end-to-end with device scoring."""
    from oar_ocr_tpu.core.types import BoxType
    from oar_ocr_tpu.models.detection.detector import DBDetector
    from oar_ocr_tpu.processors.db_postprocess import DBPostProcessConfig

    det = DBDetector(post_cfg=DBPostProcessConfig(
        box_thresh=0.05, thresh=0.45, unclip_ratio=1.0,
        box_type=BoxType.POLY))
    img = np.full((120, 160, 3), 255, np.uint8)
    img[30:60, 20:140] = 10
    out = det.detect_images([img])
    boxes, scores = out[0]
    assert len(boxes) == len(scores)
    for b in boxes:
        assert b.shape[1] == 2 and len(b) >= 3

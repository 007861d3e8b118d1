import jax.numpy as jnp
import numpy as np
import pytest

from oar_ocr_tpu.domain.layout import LAYOUT_VARIANTS, LayoutBox
from oar_ocr_tpu.ops.nms import iou_matrix, nms_fixed, topk_candidates


def test_variant_registry():
    assert "pp-doclayout_plus-l" in LAYOUT_VARIANTS
    v = LAYOUT_VARIANTS["pp-doclayout_plus-l"]
    assert v.num_classes == 20 and v.input_hw == (800, 800)
    assert LAYOUT_VARIANTS["picodet_layout_1x"].labels[0] == "text"
    assert LAYOUT_VARIANTS["rt-detr-h_layout_3cls"].model_type == "rtdetr"
    assert LAYOUT_VARIANTS["pp-doclayoutv2"].num_classes == 25


def test_should_ocr():
    assert LayoutBox("text", 0.9, np.zeros(4)).should_ocr()
    assert not LayoutBox("table", 0.9, np.zeros(4)).should_ocr()
    assert not LayoutBox("seal", 0.9, np.zeros(4)).should_ocr()


def test_iou_matrix():
    boxes = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                        jnp.float32)
    m = np.asarray(iou_matrix(boxes))
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == pytest.approx(25 / 175, abs=1e-5)
    assert m[0, 2] == 0.0


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([
        [0, 0, 10, 10],      # kept (highest in its cluster)
        [1, 1, 11, 11],      # suppressed by 0 (same class, IoU high)
        [0, 0, 10, 10],      # different class → kept
        [50, 50, 60, 60],    # far away → kept
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    labels = jnp.asarray([0, 0, 1, 0], jnp.int32)
    b, s, l, v = nms_fixed(boxes, scores, labels, iou_thresh=0.5,
                           score_thresh=0.1, max_det=4)
    v = np.asarray(v)
    assert v.sum() == 3
    kept_scores = sorted(np.asarray(s)[v].tolist(), reverse=True)
    assert kept_scores == pytest.approx([0.9, 0.7, 0.6])


def test_nms_chain_not_over_suppressed():
    """A box suppressed by a kept box cannot itself suppress others."""
    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [4, 0, 14, 10],     # IoU with 0 = 6/14 ≈ 0.43 > 0.4 → suppressed
        [8, 0, 18, 10],     # IoU with 0 = 2/18 ≈ 0.11; with 1 = 0.43 — but 1
                            # is suppressed, so 2 must be KEPT
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    labels = jnp.zeros(3, jnp.int32)
    _, _, _, v = nms_fixed(boxes, scores, labels, iou_thresh=0.4,
                           score_thresh=0.0, max_det=3)
    assert np.asarray(v).sum() == 2


def test_nms_score_thresh():
    boxes = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    _, _, _, v = nms_fixed(boxes, jnp.asarray([0.9, 0.05]),
                           jnp.zeros(2, jnp.int32), iou_thresh=0.5,
                           score_thresh=0.1, max_det=2)
    assert np.asarray(v).tolist() == [True, False]


def test_topk_candidates():
    scores = jnp.asarray([[0.1, 0.9], [0.8, 0.2], [0.3, 0.4]], jnp.float32)
    boxes = jnp.asarray([[0, 0, 1, 1], [2, 2, 3, 3], [4, 4, 5, 5]],
                        jnp.float32)
    b, s, l = topk_candidates(scores, boxes, k=2)
    assert np.asarray(s).tolist() == pytest.approx([0.9, 0.8])
    assert np.asarray(l).tolist() == [1, 0]
    np.testing.assert_allclose(np.asarray(b)[0], [0, 0, 1, 1])


@pytest.mark.parametrize("variant", ["picodet-s_layout_3cls",
                                     "rt-detr-h_layout_3cls"])
def test_layout_detector_runs(variant, rng):
    from oar_ocr_tpu.models.detection.layout import LayoutDetector

    # rtdetr variants: shrink the exact topology to test scale (arch "T")
    # — the wiring under test is identical, full dims are config data.
    overrides = (dict(arch="T", hidden_dim=64, num_queries=32,
                      num_decoder_layers=2, nhead=8, dim_feedforward=128)
                 if variant.startswith("rt-detr") else None)
    det = LayoutDetector(variant, score_thresh=0.01,
                         net_overrides=overrides)
    pages = jnp.asarray(rng.integers(0, 255, (1, 256, 256, 3), dtype=np.uint8))
    out = det.detect(pages, [(256, 256)])
    assert len(out) == 1
    for item in out[0]:
        assert item.label in det.variant.labels
        assert item.box.shape == (4,)
        # boxes scaled back to source image coordinates
        assert -256 <= item.box[0] <= 512


def test_sort_by_order_pairs_v2_v3():
    """layout_detection_adapter.rs:778-800 — V2 sorts (col, row)
    lexicographically; V3 sorts by the single order scalar."""
    from oar_ocr_tpu.domain.layout import LayoutBox
    from oar_ocr_tpu.processors.layout_postprocess import sort_by_order_pairs

    def mk(name):
        return LayoutBox(label=name, score=0.9,
                         box=np.zeros(4, np.float32))

    boxes = [mk("a"), mk("b"), mk("c")]
    pairs = [(1.0, 2.0), (0.0, 9.0), (1.0, 1.0)]
    out = sort_by_order_pairs(list(boxes), pairs, "v2")
    assert [b.label for b in out] == ["b", "c", "a"]
    assert [b.order_index for b in out] == [0.0, 1.0, 2.0]

    boxes = [mk("a"), mk("b"), mk("c")]
    out = sort_by_order_pairs(list(boxes), [(2.0,), (0.5,), (1.0,)], "v3")
    assert [b.label for b in out] == ["b", "c", "a"]

    with pytest.raises(ValueError):
        sort_by_order_pairs([], [], "v4")

"""layout_utils parity tests — fixtures mirror the reference's own unit
tests (layout_utils.rs:854-1004) plus coverage for reconciliation,
k-means combination and overlap removal."""

import pytest
import numpy as np

from oar_ocr_tpu.processors.layout_utils import (
    LayoutBox, associate_ocr_with_layout, calculate_ioa_smaller,
    combine_rectangles_kmeans, get_overlap_boxes_idx,
    get_overlap_removal_indices, reconcile_table_cells,
    remove_overlap_blocks, reprocess_table_cells_with_ocr,
    sort_layout_boxes)


pytestmark = pytest.mark.fast


class TestAssociation:
    def test_get_overlap_boxes_idx(self):
        ocr = [(10, 10, 50, 30), (60, 60, 100, 80), (200, 200, 250, 220)]
        regions = [(0, 0, 150, 150)]
        matched = get_overlap_boxes_idx(ocr, regions, 3.0)
        assert len(matched) == 2
        assert 0 in matched and 1 in matched and 2 not in matched

    def test_within(self):
        ocr = [(10, 10, 50, 30), (200, 200, 250, 220)]
        regions = [(0, 0, 100, 100)]
        a = associate_ocr_with_layout(ocr, regions, True, 3.0)
        assert a.matched_indices == [0]
        assert a.unmatched_indices == [1]

    def test_outside(self):
        ocr = [(10, 10, 50, 30), (200, 200, 250, 220)]
        regions = [(0, 0, 100, 100)]
        a = associate_ocr_with_layout(ocr, regions, False, 3.0)
        assert a.matched_indices == [1]

    def test_threshold_excludes_sliver_overlap(self):
        # 2px-wide intersection is below the 3px threshold
        ocr = [(98, 10, 130, 30)]
        regions = [(0, 0, 100, 100)]
        assert get_overlap_boxes_idx(ocr, regions, 3.0) == []


class TestSortLayoutBoxes:
    def test_single_column(self):
        elems = [LayoutBox((10, 50, 200, 70), "text"),
                 LayoutBox((10, 10, 200, 30), "title")]
        out = sort_layout_boxes(elems, 300.0)
        assert [e.label for e in out] == ["title", "text"]

    def test_two_columns(self):
        elems = [
            LayoutBox((10, 100, 90, 120), "left_bottom"),
            LayoutBox((10, 50, 90, 70), "left_top"),
            LayoutBox((250, 100, 390, 120), "right_bottom"),
            LayoutBox((250, 50, 390, 70), "right_top"),
            LayoutBox((10, 10, 390, 30), "title"),
        ]
        out = sort_layout_boxes(elems, 400.0)
        labels = [e.label for e in out]
        assert labels[0] == "title"
        assert labels.index("left_top") < labels.index("left_bottom")
        assert labels.index("right_top") < labels.index("right_bottom")

    def test_empty_and_single(self):
        assert sort_layout_boxes([], 300.0) == []
        one = [LayoutBox((10, 10, 100, 30), "text")]
        assert [e.label for e in sort_layout_boxes(one, 300.0)] == ["text"]


class TestReconcile:
    def test_exact_fill_compress(self):
        structure = [(0, 0, 50, 20), (50, 0, 100, 20), (0, 20, 100, 40)]
        detected = [
            (2, 2, 48, 18),               # exact → cell 0
            (2, 22, 49, 38), (51, 22, 98, 38),  # both → cell 2 (compress)
        ]
        out = reconcile_table_cells(structure, detected)
        assert out.shape == (3, 4)
        np.testing.assert_allclose(out[0], (2, 2, 48, 18))
        np.testing.assert_allclose(out[1], (50, 0, 100, 20))   # fill
        np.testing.assert_allclose(out[2], (2, 22, 98, 38))    # union

    def test_empty_detected_keeps_structure(self):
        s = [(0, 0, 10, 10)]
        out = reconcile_table_cells(s, [])
        np.testing.assert_allclose(out, [(0, 0, 10, 10)])

    def test_excess_detections_are_clustered(self):
        s = [(0, 0, 50, 20), (50, 0, 100, 20)]
        d = [(1, 1, 10, 19), (12, 1, 24, 19), (26, 1, 48, 19),
             (52, 1, 98, 19)]
        out = reconcile_table_cells(s, d)
        assert out.shape == (2, 4)
        assert out[0][2] <= 50 and out[1][0] >= 50


class TestKMeansCombine:
    def test_identity_when_under_target(self):
        r = [(0, 0, 10, 10), (20, 0, 30, 10)]
        out = combine_rectangles_kmeans(r, 5)
        assert out.shape == (2, 4)

    def test_merges_to_target(self):
        r = [(0, 0, 10, 10), (2, 2, 12, 12), (100, 100, 110, 110),
             (102, 98, 112, 108)]
        out = combine_rectangles_kmeans(r, 2)
        assert out.shape == (2, 4)
        corners = sorted(tuple(b) for b in out.tolist())
        np.testing.assert_allclose(corners[0], (0, 0, 12, 12))
        np.testing.assert_allclose(corners[1], (100, 98, 112, 110))


class TestReprocessCells:
    def test_exact_count_passthrough(self):
        cells = [(0, 0, 10, 10), (20, 0, 30, 10)]
        out = reprocess_table_cells_with_ocr(cells, [0.9, 0.8], [], 2)
        assert out.shape == (2, 4)

    def test_excess_keeps_top_by_score(self):
        cells = [(0, 0, 10, 10), (20, 0, 30, 10), (40, 0, 50, 10)]
        out = reprocess_table_cells_with_ocr(cells, [0.2, 0.9, 0.8], [], 2)
        assert out.shape == (2, 4)
        assert (20, 0, 30, 10) in [tuple(b) for b in out.tolist()]

    def test_uncovered_ocr_supplements(self):
        cells = [(0, 0, 30, 20)]
        ocr = [(5, 5, 25, 15),        # covered
               (100, 100, 140, 118)]  # uncovered → supplement cluster
        out = reprocess_table_cells_with_ocr(cells, [1.0], ocr, 2)
        assert out.shape == (2, 4)

    def test_no_cells_falls_back_to_ocr_clustering(self):
        ocr = [(0, 0, 10, 10), (0, 20, 10, 30), (50, 0, 60, 10)]
        out = reprocess_table_cells_with_ocr([], [], ocr, 2)
        assert out.shape == (2, 4)


class TestOverlapRemoval:
    def test_smaller_removed(self):
        elems = [LayoutBox((0, 0, 100, 100), "text"),
                 LayoutBox((10, 10, 90, 90), "text")]
        kept, removed = remove_overlap_blocks(elems, 0.65)
        assert len(kept) == 1
        assert kept[0].bbox == (0, 0, 100, 100)
        assert removed == [1]

    def test_image_loses_to_text(self):
        elems = [LayoutBox((10, 10, 90, 90), "image"),
                 LayoutBox((0, 0, 100, 100), "text")]
        kept, removed = remove_overlap_blocks(elems, 0.65)
        assert [e.label for e in kept] == ["text"]

    def test_indices_variant(self):
        boxes = [(0, 0, 100, 100), (10, 10, 90, 90), (200, 200, 300, 300)]
        dropped = get_overlap_removal_indices(boxes,
                                              ["text", "text", "text"], 0.65)
        assert dropped == {1}

    def test_ioa_smaller(self):
        assert calculate_ioa_smaller((0, 0, 10, 10), (0, 0, 5, 5)) == 1.0
        assert calculate_ioa_smaller((0, 0, 10, 10),
                                     (20, 20, 30, 30)) == 0.0

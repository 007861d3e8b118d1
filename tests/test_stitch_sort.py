import numpy as np
import pytest

from oar_ocr_tpu.domain.structure import LayoutElement, LayoutElementType
from oar_ocr_tpu.domain.text_region import TextRegion
from oar_ocr_tpu.pipelines.stitching import ResultStitcher, StitchConfig
from oar_ocr_tpu.processors.layout_sorting import (OrderLabel,
                                                   sort_layout_enhanced)


pytestmark = pytest.mark.fast


def _el(t, box, score=0.9):
    return LayoutElement(element_type=t, box=np.array(box, np.float32),
                         score=score)


def _region(box, text, conf=0.9):
    return TextRegion(box=np.array(box, np.float32), text=text,
                      confidence=conf)


class TestStitcher:
    def test_assigns_regions_to_elements(self):
        els = [_el(LayoutElementType.TEXT, [0, 0, 100, 50])]
        regs = [_region([[10, 5], [90, 5], [90, 20], [10, 20]], "line one"),
                _region([[10, 25], [90, 25], [90, 45], [10, 45]], "line two")]
        out = ResultStitcher().stitch(els, regs, 100, 100)
        assert out[0].text == "line one line two"
        assert len(out) == 1  # no orphans

    def test_orphans_become_text_elements(self):
        els = [_el(LayoutElementType.TEXT, [0, 0, 50, 50])]
        regs = [_region([[200, 200], [300, 200], [300, 220], [200, 220]],
                        "orphan")]
        out = ResultStitcher().stitch(els, regs, 400, 400)
        assert len(out) == 2
        assert out[1].text == "orphan"

    def test_table_excluded_from_matching(self):
        els = [_el(LayoutElementType.TABLE, [0, 0, 100, 100])]
        regs = [_region([[10, 10], [90, 10], [90, 30], [10, 30]], "cell text")]
        out = ResultStitcher().stitch(els, regs, 100, 100)
        # table never swallows OCR text (cell matching owns it), and
        # orphans with IoA > 0.3 inside a table are filtered — they're
        # cell text that failed to match (stitching.rs:160-230)
        assert els[0].text is None
        assert not any(e.text == "cell text" for e in out)
        assert len(out) == 1

    def test_orphan_outside_table_survives(self):
        els = [_el(LayoutElementType.TABLE, [0, 0, 100, 100])]
        regs = [_region([[10, 150], [90, 150], [90, 170], [10, 170]],
                        "caption below")]
        out = ResultStitcher().stitch(els, regs, 200, 200)
        assert any(e.text == "caption below" for e in out)

    def test_reading_order_within_element(self):
        els = [_el(LayoutElementType.TEXT, [0, 0, 100, 100])]
        regs = [_region([[10, 60], [90, 60], [90, 80], [10, 80]], "second"),
                _region([[10, 10], [90, 10], [90, 30], [10, 30]], "first")]
        out = ResultStitcher().stitch(els, regs, 100, 100)
        assert out[0].text == "first second"


class TestLayoutSort:
    def test_empty(self):
        assert sort_layout_enhanced([], 100, 100) == []

    def test_headers_first_footers_last(self):
        els = [
            _el(LayoutElementType.TEXT, [0, 50, 100, 60]),
            _el(LayoutElementType.FOOTER, [0, 90, 100, 100]),
            _el(LayoutElementType.HEADER, [0, 0, 100, 10]),
        ]
        order = sort_layout_enhanced(els, 100, 100)
        assert order[0] == 2 and order[-1] == 1

    def test_doc_title_before_body(self):
        els = [
            _el(LayoutElementType.TEXT, [0, 30, 100, 50]),
            _el(LayoutElementType.DOC_TITLE, [10, 5, 90, 25]),
        ]
        order = sort_layout_enhanced(els, 100, 100)
        assert order == [1, 0]

    def test_two_columns_by_rows(self):
        els = [
            _el(LayoutElementType.TEXT, [55, 0, 100, 45]),    # right top
            _el(LayoutElementType.TEXT, [0, 0, 45, 45]),      # left top
            _el(LayoutElementType.TEXT, [0, 55, 45, 100]),    # left bottom
            _el(LayoutElementType.TEXT, [55, 55, 100, 100]),  # right bottom
        ]
        # multi-line blocks → Y-first cut → row order (the reference's
        # own two-column fixture passes num_lines=2, rs:951)
        order = sort_layout_enhanced(els, 100, 100, num_lines=[2] * 4)
        assert order == [1, 0, 2, 3]
        # single-line blocks → X-first cut → column order (rs:279:
        # "every block has one line → use secondary direction")
        order1 = sort_layout_enhanced(els, 100, 100)
        assert order1 == [1, 2, 0, 3]

    def test_vision_title_near_vision(self):
        els = [
            _el(LayoutElementType.TEXT, [0, 0, 100, 20]),
            _el(LayoutElementType.TABLE, [0, 50, 100, 90]),
            _el(LayoutElementType.TABLE_TITLE, [20, 40, 80, 48]),
        ]
        order = sort_layout_enhanced(els, 100, 100)
        pos_title = order.index(2)
        pos_table = order.index(1)
        assert abs(pos_title - pos_table) == 1
        assert pos_title < pos_table  # title above → before

    def test_order_label_mapping(self):
        assert OrderLabel.of(LayoutElementType.HEADER) == OrderLabel.HEADER
        assert OrderLabel.of(LayoutElementType.CHART) == OrderLabel.VISION
        assert OrderLabel.of(LayoutElementType.FIGURE_TITLE) == \
            OrderLabel.VISION_TITLE


def test_shrink_overlapping_boxes():
    from oar_ocr_tpu.processors.layout_sorting import (
        OrderLabel, SortDirection, _Block, shrink_overlapping_boxes)

    # 4% overlap (< the 0.1 cut-IoU gate; a 10% overlap must NOT shrink)
    blocks = [_Block.make([0, 0, 100, 52], 0, OrderLabel.NORMAL_TEXT, 1),
              _Block.make([0, 48, 100, 100], 1, OrderLabel.NORMAL_TEXT, 1)]
    shrink_overlapping_boxes(blocks, SortDirection.VERTICAL)
    # split at floor((48+52)/2)=50 with a ±1 px gap (rs:583-586)
    assert blocks[0].bbox[3] == pytest.approx(49.0)
    assert blocks[1].bbox[1] == pytest.approx(51.0)
    # non-overlapping boxes untouched
    clean = [_Block.make([0, 0, 10, 10], 0, OrderLabel.NORMAL_TEXT, 1),
             _Block.make([0, 20, 10, 30], 1, OrderLabel.NORMAL_TEXT, 1)]
    shrink_overlapping_boxes(clean, SortDirection.VERTICAL)
    np.testing.assert_allclose(clean[0].bbox, [0, 0, 10, 10])
    np.testing.assert_allclose(clean[1].bbox, [0, 20, 10, 30])


def test_touching_columns_still_sort():
    """Columns whose boxes touch vertically still get a row cut after
    shrinking."""
    els = [
        _el(LayoutElementType.TEXT, [0, 0, 100, 52]),
        _el(LayoutElementType.TEXT, [0, 48, 100, 100]),
    ]
    order = sort_layout_enhanced(els, 100, 100)
    assert order == [0, 1]


class TestXYCutEnhancedReferenceFixtures:
    """Mirrors the reference's own layout_sorting.rs test fixtures
    (:938-1034) — expected orderings must match exactly."""

    @staticmethod
    def _els(specs):
        return [_el(t, box) for box, t in specs]

    def _sort(self, specs, num_lines=2):
        els = self._els(specs)
        return sort_layout_enhanced(
            els, 400.0, 600.0, num_lines=[num_lines] * len(els))

    def test_headers_first_footers_last(self):
        T = LayoutElementType
        order = self._sort([
            ((20, 110, 380, 135), T.TEXT),
            ((20, 560, 380, 585), T.FOOTER),
            ((20, 25, 380, 45), T.HEADER),
            ((20, 5, 380, 20), T.HEADER),
            ((20, 145, 380, 170), T.TEXT),
        ])
        assert order == [3, 2, 0, 4, 1]

    def test_doc_title_before_body(self):
        T = LayoutElementType
        order = self._sort([
            ((20, 90, 380, 120), T.TEXT),
            ((20, 55, 380, 80), T.DOC_TITLE),
            ((20, 130, 380, 160), T.TEXT),
        ])
        assert order == [1, 0, 2]

    def test_two_column_rows(self):
        T = LayoutElementType
        order = self._sort([
            ((215, 120, 380, 150), T.TEXT),
            ((20, 40, 185, 70), T.TEXT),
            ((215, 40, 380, 70), T.TEXT),
            ((20, 120, 185, 150), T.TEXT),
        ])
        assert order == [1, 2, 3, 0]

    def test_vision_title_stays_next_to_vision(self):
        from oar_ocr_tpu.processors.layout_sorting import (
            OrderLabel, _Block, associate_child_blocks)

        blocks = [
            _Block.make((20, 20, 380, 45), 0, OrderLabel.NORMAL_TEXT, 1),
            _Block.make((20, 90, 220, 190), 1, OrderLabel.VISION, 5),
            _Block.make((20, 192, 220, 210), 2, OrderLabel.VISION_TITLE, 1),
            _Block.make((20, 230, 380, 255), 3, OrderLabel.NORMAL_TEXT, 1),
        ]
        associate_child_blocks(blocks)
        assert [b.original_index for b in blocks] == [0, 1, 2, 3]

    def test_cross_layout_detection_marks_spanning_block(self):
        from oar_ocr_tpu.processors.layout_sorting import (
            OrderLabel, _Block, detect_cross_layout)

        # two columns of long text + one block spanning both
        blocks = [
            _Block.make((20, 100, 180, 400), 0, OrderLabel.NORMAL_TEXT, 20),
            _Block.make((220, 100, 380, 400), 1, OrderLabel.NORMAL_TEXT, 20),
            _Block.make((20, 420, 380, 460), 2, OrderLabel.NORMAL_TEXT, 1),
        ]
        detect_cross_layout(blocks, 400.0)
        by_idx = {b.original_index: b.label for b in blocks}
        assert by_idx[2] == OrderLabel.CROSS_LAYOUT
        assert by_idx[0] == OrderLabel.NORMAL_TEXT

import numpy as np
import pytest

from oar_ocr_tpu.domain.structure import LayoutElement, LayoutElementType
from oar_ocr_tpu.domain.text_region import TextRegion
from oar_ocr_tpu.pipelines.stitching import ResultStitcher, StitchConfig
from oar_ocr_tpu.processors.layout_sorting import (OrderLabel,
                                                   sort_layout_enhanced)


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
        # table didn't swallow the region → orphan text element
        assert els[0].text is None
        assert any(e.text == "cell text" for e in out)

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
        order = sort_layout_enhanced(els, 100, 100)
        # XY-cut with a full-width horizontal gap orders by rows
        # (the reference's own two-column test asserts row order)
        assert order == [1, 0, 2, 3]

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
    from oar_ocr_tpu.processors.layout_sorting import shrink_overlapping_boxes

    boxes = np.array([[0, 0, 100, 55], [0, 45, 100, 100]], np.float32)
    out = shrink_overlapping_boxes(boxes, axis=1)
    # previously overlapping rows now meet at the midline 50
    assert out[0, 3] == pytest.approx(50.0)
    assert out[1, 1] == pytest.approx(50.0)
    # non-overlapping boxes untouched
    clean = np.array([[0, 0, 10, 10], [0, 20, 10, 30]], np.float32)
    np.testing.assert_allclose(shrink_overlapping_boxes(clean, 1), clean)


def test_touching_columns_still_sort():
    """Columns whose boxes touch vertically still get a row cut after
    shrinking."""
    els = [
        _el(LayoutElementType.TEXT, [0, 0, 100, 52]),
        _el(LayoutElementType.TEXT, [0, 48, 100, 100]),
    ]
    order = sort_layout_enhanced(els, 100, 100)
    assert order == [0, 1]

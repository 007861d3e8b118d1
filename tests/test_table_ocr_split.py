"""Tests for the stitcher-side cross-cell OCR splitter
(processors/table_ocr_split.py ← table_ocr_split.rs:671-813 test
suite) and the stitcher's table cell matching (stitching.rs:403
stitch_tables)."""

import pytest
import numpy as np

from oar_ocr_tpu.domain.structure import (LayoutElement, LayoutElementType,
                                          TableResult)
from oar_ocr_tpu.domain.text_region import TextRegion
from oar_ocr_tpu.pipelines.stitching import (ResultStitcher, StitchConfig,
                                             stitch_tables)
from oar_ocr_tpu.processors.table import TableCell
from oar_ocr_tpu.processors.table_ocr_split import (
    SplitConfig, create_expanded_ocr_for_table, detect_cross_cell_ocr_boxes,
    split_ocr_box_at_cell_boundaries, split_text_by_ratio)


pytestmark = pytest.mark.fast


def _quad(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32)


# ---------------- split_text_by_ratio (rs:725-758) ----------------

def test_split_text_by_ratio_equal():
    parts = split_text_by_ratio("hello world foo bar", [0.5, 0.5])
    assert len(parts) == 2
    assert "".join(parts).replace(" ", "") == "helloworldfoobar"


def test_split_text_by_ratio_unequal():
    parts = split_text_by_ratio("abcdefghij", [0.3, 0.7])
    assert len(parts) == 2
    # 10 chars * 0.3 = 3 chars for the first segment (no word boundary)
    assert parts[0] == "abc"
    assert parts[1] == "defghij"


def test_split_text_empty():
    assert split_text_by_ratio("", [0.5, 0.5]) == ["", ""]


def test_split_text_single_ratio_keeps_text():
    assert split_text_by_ratio("hello", [1.0]) == ["hello"]


def test_split_text_word_boundary_snap():
    # target split at 5 of "ab cdefgh" (ratio .55) snaps after the space
    parts = split_text_by_ratio("ab cdefgh", [0.5, 0.5])
    assert parts[0] == "ab" or parts[0] == "ab cd"
    assert "".join(p.replace(" ", "") for p in parts) == "abcdefgh"


# ---------------- detection (rs:688-723) ----------------

CELLS = [(0.0, 0.0, 100.0, 50.0), (100.0, 0.0, 200.0, 50.0)]


def test_detect_no_cross_cell():
    # box fully inside cell 0
    dets = detect_cross_cell_ocr_boxes(
        [(10.0, 10.0, 90.0, 40.0)], ["hello"], CELLS)
    assert dets == []


def test_detect_cross_cell_horizontal():
    dets = detect_cross_cell_ocr_boxes(
        [(50.0, 10.0, 150.0, 40.0)], ["hello world"], CELLS)
    assert len(dets) == 1
    d = dets[0]
    assert d.affected_cell_indices == [0, 1]
    assert d.is_horizontal_split
    assert d.x_boundaries == [100.0]


def test_detect_skips_textless():
    dets = detect_cross_cell_ocr_boxes(
        [(50.0, 10.0, 150.0, 40.0)], [None], CELLS)
    assert dets == []


def test_split_horizontal_segments():
    dets = detect_cross_cell_ocr_boxes(
        [(50.0, 10.0, 150.0, 40.0)], ["hello world"], CELLS)
    segs = split_ocr_box_at_cell_boundaries(
        (50.0, 10.0, 150.0, 40.0), "hello world", dets[0], CELLS)
    assert len(segs) == 2
    (b1, t1, c1), (b2, t2, c2) = segs
    assert b1 == (50.0, 10.0, 100.0, 40.0)
    assert b2 == (100.0, 10.0, 150.0, 40.0)
    assert c1 == 0 and c2 == 1
    assert t1 and t2
    assert (t1 + t2).replace(" ", "") == "helloworld"


def test_split_vertical_by_lines():
    cells = [(0.0, 0.0, 100.0, 50.0), (0.0, 50.0, 100.0, 100.0)]
    dets = detect_cross_cell_ocr_boxes(
        [(10.0, 10.0, 60.0, 90.0)], ["line one\nline two"], cells,
        SplitConfig())
    assert len(dets) == 1
    assert not dets[0].is_horizontal_split
    segs = split_ocr_box_at_cell_boundaries(
        (10.0, 10.0, 60.0, 90.0), "line one\nline two", dets[0], cells)
    assert [t for _b, t, _c in segs] == ["line one", "line two"]
    assert [c for _b, _t, c in segs] == [0, 1]


def test_create_expanded_ocr():
    boxes = [(50.0, 10.0, 150.0, 40.0), (10.0, 10.0, 60.0, 40.0)]
    texts = ["span text", "inside"]
    expanded, processed = create_expanded_ocr_for_table(
        boxes, texts, [0.9, 0.8], CELLS)
    assert processed == {0}
    assert len(expanded) == 2
    assert all(conf == 0.9 for _b, _t, conf in expanded)


# ---------------- stitcher-side stitch_tables ----------------

def _table_element(cells, tokens, is_e2e):
    tr = TableResult(html="", cell_boxes=np.array(
        [c.bbox for c in cells], np.float32), is_e2e=is_e2e,
        structure_tokens=tokens, cells=cells)
    return LayoutElement(element_type=LayoutElementType.TABLE,
                         box=np.array([0, 0, 200, 50], np.float32),
                         table=tr)


TOKENS = ["<table>", "<tbody>", "<tr>", "<td>", "</td>", "<td>", "</td>",
          "</tr>", "</tbody>", "</table>"]


def test_stitch_tables_cross_cell_split_detected():
    """A detected-cells table: a cross-cell OCR box is split at the cell
    boundary and each half lands in its own cell (stitching.rs:434,
    sort_and_join join for detected cells rs:573-592)."""
    cells = [TableCell((0.0, 0.0, 100.0, 50.0), row=0, col=0),
             TableCell((100.0, 0.0, 200.0, 50.0), row=0, col=1)]
    el = _table_element(cells, TOKENS, is_e2e=False)
    regions = [TextRegion(box=_quad(10, 10, 190, 40),
                          text="alpha beta", confidence=0.95)]
    used = set()
    stitch_tables([el], regions, used, StitchConfig())
    assert used == {0}                        # original consumed by split
    texts = [c.text for c in el.table.cells]
    assert texts[0] and texts[1]
    assert (texts[0] + texts[1]).replace(" ", "") == "alphabeta"
    assert "alpha" in el.table.html and "beta" in el.table.html


def test_stitch_tables_e2e_join_style():
    """E2E cells skip splitting and row-aware matching; the PaddleX
    join strips <b> prefix/</b> suffix and joins with <br/>
    (stitching.rs:565, :906)."""
    cells = [TableCell((0.0, 0.0, 200.0, 50.0))]
    el = _table_element(cells, ["<table>", "<tr>", "<td>", "</td>",
                                "</tr>", "</table>"], is_e2e=True)
    regions = [
        TextRegion(box=_quad(10, 5, 80, 20), text="<b>head</b>",
                   confidence=0.9),
        TextRegion(box=_quad(10, 30, 80, 45), text=" tail", confidence=0.9),
    ]
    used = set()
    stitch_tables([el], regions, used, StitchConfig())
    assert el.table.cells[0].text == "head<br/>tail"
    assert used == {0, 1}


def test_stitch_tables_formula_injection():
    """A recognized formula overlapping the table joins cell matching
    with $…$ wrapping (stitching.rs:485-508)."""
    cells = [TableCell((0.0, 0.0, 200.0, 50.0))]
    el = _table_element(cells, ["<table>", "<tr>", "<td>", "</td>",
                                "</tr>", "</table>"], is_e2e=True)
    formula = LayoutElement(element_type=LayoutElementType.FORMULA,
                            box=np.array([20, 10, 120, 40], np.float32),
                            formula_latex="E=mc^2")
    used = set()
    stitch_tables([el, formula], [], used, StitchConfig())
    assert el.table.cells[0].text == "$E=mc^2$"


def test_stitch_full_marks_table_regions_used():
    """Through ResultStitcher.stitch: a region matched into a cell does
    not become an orphan element."""
    cells = [TableCell((0.0, 0.0, 200.0, 50.0))]
    el = _table_element(cells, ["<table>", "<tr>", "<td>", "</td>",
                                "</tr>", "</table>"], is_e2e=True)
    regions = [TextRegion(box=_quad(10, 10, 90, 40), text="inside",
                          confidence=0.9)]
    out = ResultStitcher().stitch([el], regions, 200, 50)
    assert sum(1 for e in out
               if e.element_type == LayoutElementType.TEXT) == 0
    assert ">inside<" in el.table.html

"""PP-StructureV3 stitching-rule parity tests — fixtures mirror the
reference's own stitching.rs unit tests (:2087-2395) exactly, plus the
format_line joining behaviors."""

import pytest
import numpy as np

from oar_ocr_tpu.domain.text_region import TextRegion
from oar_ocr_tpu.pipelines.stitching import (StitchConfig, is_overlapping,
                                             sort_and_join_texts)
from oar_ocr_tpu.processors.table import (
    TableCell, collect_cell_texts_for_tokens, compose_matched_cell_text,
    find_row_start_index, match_table_and_ocr_by_iou_distance,
    match_table_cells_with_structure_rows, normalize_checkbox_symbols,
    normalize_tiny_symbol)


pytestmark = pytest.mark.fast


def _region(x0, y0, x1, y1, text, conf=0.9, label=None):
    return TextRegion(
        box=np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32),
        text=text, confidence=conf, label=label)


class TestTinySymbolNormalization:
    def test_dash(self):
        assert normalize_tiny_symbol("=", 0.33, (0, 0, 10, 9)) == "-"

    def test_comma(self):
        assert normalize_tiny_symbol("=", 0.40, (0, 0, 7, 6)) == ","

    def test_semicolon(self):
        assert normalize_tiny_symbol("0", 0.13, (0, 0, 12, 13)) == ";"

    def test_high_confidence_untouched(self):
        assert normalize_tiny_symbol("=", 0.9, (0, 0, 7, 6)) == "="


class TestIsOverlapping:
    def test_threshold(self):
        b1, b2 = (0, 0, 10, 10), (5, 5, 20, 20)
        assert is_overlapping(b1, b2, StitchConfig())
        assert not is_overlapping(b1, b2,
                                  StitchConfig(overlap_min_pixels=5.0))


class TestSortAndJoin:
    def _join(self, items, container=None):
        return sort_and_join_texts(items, container, StitchConfig())

    def test_tolerance_same_line(self):
        r1 = _region(0, 0, 10, 10, "A")
        r2 = _region(12, 1, 20, 11, "B")
        assert self._join([(r1, "A"), (r2, "B")]) == "A B"

    def test_english_tail_uses_larger_paragraph_gap(self):
        r1 = _region(0, 0, 60, 10, "Line")
        r2 = _region(0, 20, 40, 30, "next")
        got = self._join([(r1, "Line"), (r2, "next")],
                         container=(0, 0, 100, 40))
        assert got == "Line next"

    def test_non_english_tail_keeps_original_gap(self):
        r1 = _region(0, 0, 60, 10, "2024")
        r2 = _region(0, 20, 40, 30, "next")
        got = self._join([(r1, "2024"), (r2, "next")],
                         container=(0, 0, 100, 40))
        assert got == "2024\nnext"

    def test_non_break_punctuation_suppresses_newline(self):
        r1 = _region(0, 0, 20, 10, "Note:")
        r2 = _region(0, 20, 40, 30, "next")
        got = self._join([(r1, "Note:"), (r2, "next")],
                         container=(0, 0, 100, 40))
        assert got == "Note:next"

    def test_dehyphenation_at_line_wrap(self):
        r1 = _region(0, 0, 96, 10, "exam-")
        r2 = _region(0, 20, 40, 30, "ple")
        got = self._join([(r1, "exam-"), (r2, "ple")],
                         container=(0, 0, 100, 40))
        assert got == "example"

    def test_inline_formula_wrapped(self):
        r1 = _region(0, 0, 30, 10, "see")
        r2 = _region(35, 0, 60, 10, "x^2", label="formula")
        got = self._join([(r1, "see"), (r2, "x^2")])
        assert got == "see $x^2$"

    def test_display_formula_double_wrapped(self):
        r = _region(0, 0, 60, 10, "E=mc^2", label="formula")
        assert self._join([(r, "E=mc^2")]) == "$$E=mc^2$$"


class TestCheckboxNormalization:
    def test_checkbox_like(self):
        cells = [TableCell((0, 0, 10, 10), text="ü"),
                 TableCell((10, 0, 20, 10), text="X"),
                 TableCell((20, 0, 30, 10), text="L")]
        normalize_checkbox_symbols(cells)
        assert [c.text for c in cells] == ["✓", "✗", "✓"]

    def test_ambiguous_kept_when_not_checkbox_like(self):
        cells = [TableCell((0, 0, 10, 10), text="L"),
                 TableCell((10, 0, 20, 10), text="A")]
        normalize_checkbox_symbols(cells)
        assert [c.text for c in cells] == ["L", "A"]


class TestRowStructureMatching:
    TOKENS_2X2 = ["<table>", "<tbody>",
                  "<tr>", "<td></td>", "<td></td>", "</tr>",
                  "<tr>", "<td></td>", "<td></td>", "</tr>",
                  "</tbody>", "</table>"]

    def test_find_row_start_index_with_compact_td_tokens(self):
        tokens = ["<table>", "<tbody>",
                  "<tr>", "<td></td>", "<td></td>", "</tr>",
                  "<tr>", '<td rowspan="2"></td>', "<td></td>", "</tr>",
                  "</tbody>", "</table>"]
        assert find_row_start_index(tokens) == [0, 2]

    def test_match_table_cells_with_structure_rows(self):
        # deliberately out-of-order cells (rs:2256 fixture)
        cells = [TableCell((50, 0, 100, 20)), TableCell((0, 0, 50, 20)),
                 TableCell((0, 20, 50, 40)), TableCell((50, 20, 100, 40))]
        ocr_boxes = [(2, 2, 48, 18), (52, 2, 98, 18),
                     (2, 22, 48, 38), (52, 22, 98, 38)]
        ocr_texts = ["A", "B", "C", "D"]
        got = match_table_cells_with_structure_rows(
            cells, self.TOKENS_2X2, ocr_boxes, ocr_texts, 10.0)
        assert got is not None
        mapping, matched = got
        assert mapping == [1, 0, 2, 3]
        assert len(matched) == 4
        assert cells[1].text == "A"
        assert cells[0].text == "B"
        assert cells[2].text == "C"
        assert cells[3].text == "D"

    def test_collect_cell_texts_grid_order(self):
        cells = [TableCell((0, 0, 50, 20), text="A", row=0, col=0),
                 TableCell((50, 0, 100, 20), text="B", row=0, col=1)]
        tokens = ["<tr>", "<td></td>", "<td></td>", "</tr>"]
        assert collect_cell_texts_for_tokens(cells, tokens) == ["A", "B"]

    def test_compose_matched_cell_text_br_join(self):
        assert compose_matched_cell_text([0, 1], ["top", "bottom"]) == \
            "top<br/>bottom"
        assert compose_matched_cell_text([0], ["<b>solo</b>"]) == \
            "<b>solo</b>"


class TestIoUDistanceMatching:
    def test_prefers_first_cell_on_exact_tie(self):
        cells = [TableCell((0, 0, 20, 20)), TableCell((0, 0, 20, 20))]
        mapping, matched = match_table_and_ocr_by_iou_distance(
            cells, [(2, 2, 18, 18)], False, True)
        assert len(matched) == 1
        assert mapping.get(0) == [0]
        assert 1 not in mapping

    def test_boundary_near_tie_stays_stable(self):
        cells = [TableCell((0, 0, 20, 20)),
                 TableCell((0, 9.99995, 20, 29.99995))]
        mapping, _ = match_table_and_ocr_by_iou_distance(
            cells, [(0, 10, 20, 20)], False, True)
        assert mapping.get(0) == [0]
        assert 1 not in mapping

    def test_boundary_straddle_prefers_upper_row(self):
        cells = [TableCell((564.6841, 142.27391, 584.9476, 157.74164),
                           row=2, col=2),
                 TableCell((565.3968, 158.34259, 584.0292, 171.04494),
                           row=3, col=2)]
        mapping, matched = match_table_and_ocr_by_iou_distance(
            cells, [(567.0, 151.0, 583.0, 166.0)], False, True)
        assert len(matched) == 1
        assert mapping.get(0) == [0]
        assert 1 not in mapping

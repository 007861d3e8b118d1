import numpy as np
import pytest

from oar_ocr_tpu.processors.table import (CellInfo, cell_aabbs,
                                          match_ocr_to_cells,
                                          parse_cell_grid_info,
                                          split_ocr_boxes_by_cells,
                                          wrap_table_html)


def test_parse_grid_simple():
    tokens = ["<tr>", "<td></td>", "<td></td>", "</tr>",
              "<tr>", "<td></td>", "<td></td>", "</tr>"]
    cells = parse_cell_grid_info(tokens)
    assert [(c.row, c.col) for c in cells] == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_parse_grid_spans():
    tokens = ["<tr>", "<td", ' colspan="2"', ">", "</td>", "</tr>",
              "<tr>", "<td></td>", "<td></td>", "</tr>"]
    cells = parse_cell_grid_info(tokens)
    assert cells[0].colspan == 2
    assert [(c.row, c.col) for c in cells] == [(0, 0), (1, 0), (1, 1)]


def test_parse_grid_rowspan_occupancy():
    tokens = ["<tr>", "<td", ' rowspan="2"', ">", "</td>", "<td></td>", "</tr>",
              "<tr>", "<td></td>", "</tr>"]
    cells = parse_cell_grid_info(tokens)
    # second-row cell must skip col 0 (occupied by the rowspan)
    assert (cells[2].row, cells[2].col) == (1, 1)


def test_wrap_table_html():
    tokens = ["<tbody>", "<tr>", "<td></td>", "<td", ' colspan="2"', ">",
              "</td>", "</tr>", "</tbody>"]
    html = wrap_table_html(tokens, ["A", "B"])
    assert html.startswith("<html><body><table>")
    assert "<td>A</td>" in html
    assert '<td colspan="2">B</td>' in html
    assert html.endswith("</table></body></html>")


def test_cell_aabbs():
    boxes = np.array([[0, 0, 10, 0, 10, 5, 0, 5]], np.float32)
    ab = cell_aabbs(boxes)
    np.testing.assert_allclose(ab[0], [0, 0, 10, 5])


def test_match_ocr_to_cells():
    cells = np.array([
        [0, 0, 50, 0, 50, 20, 0, 20],
        [50, 0, 100, 0, 100, 20, 50, 20],
    ], np.float32)
    ocr_boxes = [np.array([[5, 5], [45, 5], [45, 15], [5, 15]], np.float32),
                 np.array([[55, 5], [95, 5], [95, 15], [55, 15]], np.float32),
                 np.array([[10, 2], [40, 2], [40, 9], [10, 9]], np.float32)]
    texts = match_ocr_to_cells(cells, ocr_boxes, ["left", "right", "top"])
    assert texts[1] == "right"
    assert "left" in texts[0] and "top" in texts[0]
    # reading order within cell: top (y=2) before left (y=5)
    assert texts[0].startswith("top")


def test_split_ocr_boxes_by_cells():
    cells = np.array([[0, 0, 50, 20], [50, 0, 100, 20]], np.float32)
    spanning = np.array([[10, 5], [90, 5], [90, 15], [10, 15]], np.float32)
    inside = np.array([[5, 5], [40, 5], [40, 15], [5, 15]], np.float32)
    out = split_ocr_boxes_by_cells([spanning, inside], cells)
    spans = [q for i, q in out if i == 0]
    assert len(spans) == 2
    assert spans[0][:, 0].max() <= 50.01
    ins = [q for i, q in out if i == 1]
    assert len(ins) == 1

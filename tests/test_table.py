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
    """Exact structure.rs:1630-1846 semantics: overlap = inter/CELL area
    > 0.5, cells sorted by x1, per-cell + gap + edge segments."""
    cells = np.array([[0, 0, 50, 20], [60, 0, 100, 20]], np.float32)
    spanning = (5.0, 2.0, 95.0, 18.0)   # covers >50% of both cells
    inside = (5.0, 2.0, 40.0, 18.0)     # 56% of cell 0 only
    out = split_ocr_boxes_by_cells([spanning, inside], cells)
    assert out[1] is None                        # < 2 cells → keep as-is
    segs = out[0]
    # leading none (5 > 0 ⇒ box starts inside cell 0 range? no leading
    # since bx0 >= cell0.x0 is false here: 5 > 0), cell0 clamp, gap
    # 50..60, cell1 clamp
    assert segs == [(5.0, 2.0, 50.0, 18.0), (50.0, 2.0, 60.0, 18.0),
                    (60.0, 2.0, 95.0, 18.0)]


def test_split_ocr_boxes_leading_trailing():
    cells = np.array([[20, 0, 50, 10], [50, 0, 80, 10]], np.float32)
    box = (0.0, 1.0, 100.0, 9.0)
    (segs,) = split_ocr_boxes_by_cells([box], cells)
    assert segs[0] == (0.0, 1.0, 20.0, 9.0)      # leading
    assert segs[-1] == (80.0, 1.0, 100.0, 9.0)   # trailing
    assert (20.0, 1.0, 50.0, 9.0) in segs and (50.0, 1.0, 80.0, 9.0) in segs


class TestTableOrientation:
    def test_rotation_matrix_roundtrip(self):
        """rotation_matrix maps de-rotated px to crop px exactly as
        np.rot90 moves pixels, for every k."""
        import numpy as np

        from oar_ocr_tpu.models.recognition.slanet import (derot_dims,
                                                           rotation_matrix)

        rng = np.random.default_rng(0)
        crop = rng.integers(0, 255, (5, 7), dtype=np.uint8)
        h, w = crop.shape
        for ang in (0, 90, 180, 270):
            derot = np.rot90(crop, ang // 90)
            dw, dh = derot_dims(ang, w, h)
            assert derot.shape == (dh, dw)
            R = rotation_matrix(ang, w, h)
            for y_d in range(dh):
                for x_d in range(dw):
                    x_c, y_c, _ = R @ np.array([x_d, y_d, 1.0])
                    assert derot[y_d, x_d] == crop[int(round(y_c)),
                                                   int(round(x_c))], ang

    def test_rotate_boxes_back_inverse(self):
        import numpy as np

        from oar_ocr_tpu.models.recognition.slanet import (rotate_boxes_back,
                                                           rotation_matrix)

        w, h = 30, 20
        boxes = np.array([[1.0, 2.0, 10.0, 2.0, 10.0, 8.0, 1.0, 8.0]],
                         np.float32)
        for ang in (90, 180, 270):
            back = rotate_boxes_back(boxes, ang, w, h)
            # applying the matrix to the points directly must agree
            R = rotation_matrix(ang, w, h)
            pts = boxes.reshape(-1, 2)
            exp = (pts @ R[:2, :2].T + R[:2, 2]).reshape(1, 8)
            np.testing.assert_allclose(back, exp, atol=1e-5)

    def test_slanet_derotated_sampling(self):
        """A 90°-rotated table fed through recognize(angles=[90]) samples
        the same upright pixels as the unrotated crop through
        recognize(angles=[0]) — verified by comparing decoded structures
        on a deterministic model."""
        import jax.numpy as jnp
        import numpy as np

        from oar_ocr_tpu.models.recognition.slanet import SLANetModel

        m = SLANetModel(max_steps=4)
        rng = np.random.default_rng(3)
        crop = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
        page_a = np.zeros((1, 128, 128, 3), np.uint8)
        page_a[0, 10:70, 5:95] = crop
        rot = np.rot90(crop, 3)          # content appears rotated 90°
        page_b = np.zeros((1, 128, 128, 3), np.uint8)
        page_b[0, 5:95, 10:70] = rot
        out_a = m.recognize(jnp.asarray(page_a), [(0, (5, 10, 95, 70))],
                            angles=[0])
        out_b = m.recognize(jnp.asarray(page_b), [(0, (10, 5, 70, 95))],
                            angles=[90])
        assert out_a[0].tokens == out_b[0].tokens


def test_wired_wireless_structure_routing():
    """Distinct wired/wireless structure models receive exactly their
    kind's tables (with_wired/wireless_table_structure slots)."""
    import numpy as np

    from oar_ocr_tpu.models.recognition.slanet import TableStructure
    from oar_ocr_tpu.pipelines.table_analyzer import (TableAnalyzer,
                                                      TableRegionInput)

    calls = {}

    class StubStructure:
        def __init__(self, name):
            self.name = name

        def recognize(self, pages, regions, angles=None):
            calls[self.name] = list(regions)
            return [TableStructure(tokens=["<tr>", "</tr>"],
                                   cell_boxes=np.zeros((0, 8), np.float32),
                                   score=1.0) for _ in regions]

    class StubClassifier:
        def classify_quads(self, pages, quads):
            return [(i % 2, 0.9) for i in range(len(quads))]

    wired, wireless = StubStructure("wired"), StubStructure("wireless")
    ta = TableAnalyzer(classifier=StubClassifier(),
                       structure=StubStructure("shared"),
                       wired_structure=wired,
                       wireless_structure=wireless,
                       use_cell_detection=False)
    tables = [TableRegionInput(page_index=0, box=(0, 0, 40 + i, 30))
              for i in range(4)]
    out = ta.analyze_tables(np.zeros((1, 64, 64, 3), np.uint8), tables)
    assert len(out) == 4
    assert [r[1][2] for r in calls["wired"]] == [40, 42]      # tables 0, 2
    assert [r[1][2] for r in calls["wireless"]] == [41, 43]   # tables 1, 3
    assert [t.is_wired for t in out] == [True, False, True, False]


# ------- detected-cells → HTML structure (table_analyzer.rs:79-266) -------

class TestCellsToHtmlStructure:
    def test_row_major_order(self):
        from oar_ocr_tpu.processors.table import table_cells_to_html_structure
        # 2x2 grid supplied out of order: reconstruction is row-major
        cells = np.array([[50, 50, 100, 100],      # bottom-right
                          [0, 0, 50, 50],          # top-left
                          [0, 50, 50, 100],        # bottom-left
                          [50, 0, 100, 50]],       # top-right
                         np.float32)
        tokens, order = table_cells_to_html_structure(cells, 5.0)
        assert tokens.count("<tr>") == 2
        assert tokens.count("<td></td>") == 4
        assert [s for s, _g in order] == [1, 3, 2, 0]
        g = [g for _s, g in order]
        assert (g[0].row, g[0].col) == (0, 0)
        assert (g[3].row, g[3].col) == (1, 1)

    def test_rowspan_and_colspan(self):
        from oar_ocr_tpu.processors.table import table_cells_to_html_structure
        cells = np.array([[0, 0, 50, 100],         # spans both rows
                          [50, 0, 100, 50],
                          [50, 50, 100, 100]], np.float32)
        tokens, order = table_cells_to_html_structure(cells, 5.0)
        # span cells are ONE combined token with a </td> closer so the
        # row matcher's is_td_end_token counts them
        assert '<td rowspan="2"></td>' in tokens
        g0 = order[0][1]
        assert g0.rowspan == 2 and g0.colspan == 1
        # second row contains only the right cell
        assert tokens.count("<tr>") == 2
        from oar_ocr_tpu.processors.table import parse_cell_grid_info
        grid = parse_cell_grid_info(tokens)
        assert [(g.row, g.col, g.rowspan) for g in grid] == \
            [(0, 0, 2), (0, 1, 1), (1, 1, 1)]

    def test_jittered_edges_cluster(self):
        from oar_ocr_tpu.processors.table import table_cells_to_html_structure
        cells = np.array([[0, 0, 49, 50], [51, 2, 100, 49],
                          [1, 52, 50, 100], [50, 51, 99, 101]], np.float32)
        tokens, order = table_cells_to_html_structure(cells, 5.0)
        assert tokens.count("<td></td>") == 4     # jitter merged to 3 lines

    def test_degenerate_returns_none(self):
        from oar_ocr_tpu.processors.table import table_cells_to_html_structure
        assert table_cells_to_html_structure(
            np.zeros((0, 4), np.float32), 5.0) is None
        # all edges collapse to one cluster per axis → no grid
        assert table_cells_to_html_structure(
            np.array([[0, 0, 2, 2]], np.float32), 5.0) is None

    def test_wrap_html_from_generated_tokens(self):
        from oar_ocr_tpu.processors.table import (
            table_cells_to_html_structure, wrap_table_html)
        cells = np.array([[0, 0, 50, 100], [50, 0, 100, 50],
                          [50, 50, 100, 100]], np.float32)
        tokens, order = table_cells_to_html_structure(cells, 5.0)
        html = wrap_table_html(tokens, ["A", "B", "C"])
        assert '<td rowspan="2">A</td>' in html
        assert "<td>B</td>" in html and "<td>C</td>" in html
        # tokens carry their own <table> wrapper: no doubled tag
        assert html.count("<table>") == 1 and html.count("</table>") == 1

    def test_generated_tokens_row_match_with_span(self):
        """Round-3 review repro: OCR boxes must map 1:1 through the
        generated tokens even when a cell spans rows (the split-token
        form used to collapse the mapping to [0, 0])."""
        from oar_ocr_tpu.processors.table import (
            TableCell, match_table_cells_with_structure_rows,
            table_cells_to_html_structure)
        boxes = np.array([[0, 0, 50, 100],       # rowspan 2
                          [50, 0, 100, 50],
                          [50, 50, 100, 100]], np.float32)
        tokens, order = table_cells_to_html_structure(boxes, 5.0)
        cells = [TableCell(tuple(map(float, boxes[s])),
                           row=g.row, col=g.col)
                 for s, g in order]
        ocr_boxes = [(5, 40, 45, 60), (55, 10, 95, 40), (55, 60, 95, 90)]
        got = match_table_cells_with_structure_rows(
            cells, tokens, ocr_boxes, ["left", "topright", "botright"],
            has_detected_cells=True)
        assert got is not None
        td_map = got[0]
        assert len(td_map) == 3                  # one slot per td token
        texts = [cells[ci].text if ci is not None else None
                 for ci in td_map]
        assert texts == ["left", "topright", "botright"]

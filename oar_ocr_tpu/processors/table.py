"""Table structure processing: HTML assembly, cell grid, OCR→cell matching.

Re-expresses oar-ocr-core/src/processors/table_structure_decode.rs (logits→
HTML tokens + cell bboxes, parse_cell_grid_info, wrap_table_html*) and the
OCR-to-cell assignment used by the table analyzer
(oar-ocr/src/oarocr/table_analyzer.rs) plus cross-cell OCR box splitting
(processors/table_ocr_split.rs) in host Python. Pure geometry/string work —
device never sees this.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class CellInfo:
    """Grid placement of one cell (parse_cell_grid_info)."""

    row: int
    col: int
    rowspan: int = 1
    colspan: int = 1


def parse_cell_grid_info(tokens: Sequence[str]) -> List[CellInfo]:
    """Walk structure tokens tracking (row, col) occupancy incl. spans."""

    cells: List[CellInfo] = []
    occupied: dict = {}          # (row, col) -> True for rowspan carryover
    row = -1
    col = 0
    i = 0
    n = len(tokens)
    while i < n:
        tok = tokens[i]
        if tok == "<tr>":
            row += 1
            col = 0
        elif tok in ("<td></td>", "<td"):
            rowspan = colspan = 1
            if tok == "<td":
                # attributes until '>'
                j = i + 1
                while j < n and tokens[j] != ">":
                    attr = tokens[j].strip()
                    if attr.startswith("rowspan="):
                        rowspan = int(attr.split('"')[1])
                    elif attr.startswith("colspan="):
                        colspan = int(attr.split('"')[1])
                    j += 1
                i = j
            while occupied.get((row, col)):
                col += 1
            cells.append(CellInfo(row=max(row, 0), col=col,
                                  rowspan=rowspan, colspan=colspan))
            for r in range(max(row, 0), max(row, 0) + rowspan):
                for c in range(col, col + colspan):
                    occupied[(r, c)] = True
            col += colspan
        i += 1
    return cells


def wrap_table_html(tokens: Sequence[str],
                    cell_texts: Optional[Sequence[str]] = None) -> str:
    """Assemble full HTML, inserting ``cell_texts`` into successive cells
    (table_structure_decode.rs wrap_table_html*)."""

    out: List[str] = ["<html><body><table>"]
    cell_i = 0
    i = 0
    n = len(tokens)

    def next_text() -> str:
        nonlocal cell_i
        t = (cell_texts[cell_i] if cell_texts and cell_i < len(cell_texts)
             else "")
        cell_i += 1
        return t

    while i < n:
        tok = tokens[i]
        if tok == "<td></td>":
            out.append(f"<td>{next_text()}</td>")
        elif tok == "<td":
            attrs = []
            j = i + 1
            while j < n and tokens[j] != ">":
                attrs.append(tokens[j])
                j += 1
            out.append(f"<td{''.join(attrs)}>{next_text()}</td>")
            i = j
        else:
            out.append(tok)
        i += 1
    out.append("</table></body></html>")
    return "".join(out)


def cell_box_to_quad(box8: np.ndarray) -> np.ndarray:
    """(8,) [x1,y1,…,x4,y4] → (4,2) quad."""
    return np.asarray(box8, np.float32).reshape(4, 2)


def cell_aabbs(cell_boxes: np.ndarray) -> np.ndarray:
    """(N, 8) corner boxes → (N, 4) xyxy AABBs."""
    if len(cell_boxes) == 0:
        return np.zeros((0, 4), np.float32)
    q = cell_boxes.reshape(-1, 4, 2)
    return np.concatenate([q.min(1), q.max(1)], axis=1).astype(np.float32)


def match_ocr_to_cells(cell_boxes: np.ndarray,
                       ocr_boxes: Sequence[np.ndarray],
                       ocr_texts: Sequence[str]) -> List[str]:
    """Assign each OCR region to the cell containing its center (max-IoA
    fallback); concatenate texts per cell in reading order
    (table_analyzer.rs cell matching)."""

    aabbs = cell_aabbs(cell_boxes)
    n_cells = len(aabbs)
    assigned: List[List[Tuple[float, float, str]]] = [[] for _ in range(n_cells)]
    for box, text in zip(ocr_boxes, ocr_texts):
        b = np.asarray(box, np.float32).reshape(-1, 2)
        cx, cy = float(b[:, 0].mean()), float(b[:, 1].mean())
        best, best_metric = -1, 0.0
        for ci in range(n_cells):
            x0, y0, x1, y1 = aabbs[ci]
            if x0 <= cx <= x1 and y0 <= cy <= y1:
                # prefer the smallest containing cell
                metric = 1.0 / max((x1 - x0) * (y1 - y0), 1e-6)
                if best == -1 or metric > best_metric:
                    best, best_metric = ci, metric
        if best == -1 and n_cells:
            # fallback: max intersection-over-ocr-area
            bx0, by0 = b.min(0)
            bx1, by1 = b.max(0)
            area = max((bx1 - bx0) * (by1 - by0), 1e-6)
            for ci in range(n_cells):
                x0, y0, x1, y1 = aabbs[ci]
                iw = max(0.0, min(bx1, x1) - max(bx0, x0))
                ih = max(0.0, min(by1, y1) - max(by0, y0))
                ioa = iw * ih / area
                if ioa > best_metric and ioa > 0.3:
                    best, best_metric = ci, ioa
        if best >= 0:
            assigned[best].append((cy, cx, text))
    out = []
    for items in assigned:
        items.sort()
        out.append(" ".join(t for _, _, t in items if t).strip())
    return out


def split_ocr_boxes_by_cells(
    ocr_boxes: Sequence[np.ndarray],
    cell_xyxy: np.ndarray,
    *,
    min_overlap_ratio: float = 0.1,
) -> List[Tuple[int, np.ndarray]]:
    """Split OCR boxes spanning multiple cells at cell x-boundaries.

    Re-expresses processors/table_ocr_split.rs:1-813: an OCR line crossing
    several cells in one row is cut at each cell boundary so each fragment
    can be re-recognized per cell. Returns (source_index, sub_quad) pairs;
    boxes inside a single cell pass through unchanged.
    """

    out: List[Tuple[int, np.ndarray]] = []
    for i, box in enumerate(ocr_boxes):
        b = np.asarray(box, np.float32).reshape(-1, 2)
        bx0, by0 = b.min(0)
        bx1, by1 = b.max(0)
        h = by1 - by0
        # find cells overlapping vertically and horizontally
        hits = []
        for (x0, y0, x1, y1) in cell_xyxy:
            if min(by1, y1) - max(by0, y0) > 0.5 * h:
                ov = min(bx1, x1) - max(bx0, x0)
                if ov > min_overlap_ratio * max(x1 - x0, 1e-6):
                    hits.append((max(bx0, x0), min(bx1, x1)))
        hits.sort()
        if len(hits) <= 1:
            out.append((i, b))
            continue
        for (sx0, sx1) in hits:
            quad = np.array([[sx0, by0], [sx1, by0],
                             [sx1, by1], [sx0, by1]], np.float32)
            out.append((i, quad))
    return out

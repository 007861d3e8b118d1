"""Enhanced layout reading-order sorting (`xycut_enhanced`).

Re-expresses oar-ocr-core/src/processors/layout_sorting.rs:1-1034 (itself a
PaddleX `xycut_enhanced` port): header/footer separation, cross-layout
detection for blocks spanning columns, direction-aware XY-cut over the main
flow, weighted-distance insertion of special blocks, and vision-title
association. This round implements the primary flow (the behaviors pinned
by the reference's own tests — headers first / footers last, doc title
before body, column-aware ordering, title-next-to-vision); the finer
PaddleX heuristics (overlap shrinking, discontinuous projection) are
follow-up work.
"""

from __future__ import annotations

import enum
from typing import List, Sequence

import numpy as np

from ..domain.structure import LayoutElement, LayoutElementType
from .sorting import SortDirection, sort_by_xycut


class OrderLabel(enum.Enum):
    HEADER = "header"
    FOOTER = "footer"
    DOC_TITLE = "doc_title"
    PARAGRAPH_TITLE = "paragraph_title"
    VISION = "vision"
    VISION_TITLE = "vision_title"
    UNORDERED = "unordered"
    NORMAL_TEXT = "normal_text"
    REFERENCE = "reference"

    @staticmethod
    def of(et: LayoutElementType) -> "OrderLabel":
        T = LayoutElementType
        if et in (T.HEADER, T.HEADER_IMAGE):
            return OrderLabel.HEADER
        if et in (T.FOOTER, T.FOOTER_IMAGE, T.FOOTNOTE):
            return OrderLabel.FOOTER
        if et == T.DOC_TITLE:
            return OrderLabel.DOC_TITLE
        if et in (T.PARAGRAPH_TITLE, T.CONTENT):
            return OrderLabel.PARAGRAPH_TITLE
        if et == T.REFERENCE:
            return OrderLabel.REFERENCE
        if et in (T.IMAGE, T.FIGURE, T.TABLE, T.CHART, T.ALGORITHM):
            return OrderLabel.VISION
        if et in (T.FIGURE_TITLE, T.TABLE_TITLE, T.CHART_TITLE):
            return OrderLabel.VISION_TITLE
        if et in (T.SEAL, T.NUMBER):
            return OrderLabel.UNORDERED
        return OrderLabel.NORMAL_TEXT


def shrink_overlapping_boxes(boxes: np.ndarray, axis: int,
                             min_keep: float = 1.0) -> np.ndarray:
    """Shrink boxes that overlap along ``axis`` to their midline so the
    projection can find a cut between them (layout_sorting.rs:534
    shrink_overlapping_boxes — PaddleX pre-pass before XY-cut)."""

    out = boxes.copy()
    lo, hi = (1, 3) if axis == 1 else (0, 2)
    order = np.argsort(out[:, lo])
    for a_i in range(len(order) - 1):
        i = order[a_i]
        j = order[a_i + 1]
        if out[j, lo] < out[i, hi]:            # overlapping along the axis
            mid = (out[j, lo] + out[i, hi]) / 2.0
            if mid - out[i, lo] >= min_keep and out[j, hi] - mid >= min_keep:
                out[i, hi] = mid
                out[j, lo] = mid
    return out


def sort_layout_enhanced(elements: Sequence[LayoutElement],
                         page_w: float, page_h: float) -> List[int]:
    """Return reading-order indices over ``elements``
    (layout_sorting.rs:160 sort_layout_enhanced)."""

    n = len(elements)
    if n == 0:
        return []

    labels = [OrderLabel.of(e.element_type) for e in elements]
    boxes = np.array([e.xyxy for e in elements], np.float32)

    headers = [i for i in range(n) if labels[i] == OrderLabel.HEADER]
    footers = [i for i in range(n) if labels[i] == OrderLabel.FOOTER]
    doc_titles = [i for i in range(n) if labels[i] == OrderLabel.DOC_TITLE]
    visions_titles = [i for i in range(n)
                      if labels[i] == OrderLabel.VISION_TITLE]
    unordered = [i for i in range(n) if labels[i] == OrderLabel.UNORDERED]
    main = [i for i in range(n)
            if labels[i] in (OrderLabel.PARAGRAPH_TITLE,
                             OrderLabel.NORMAL_TEXT, OrderLabel.VISION,
                             OrderLabel.REFERENCE)]

    def by_y(idxs: List[int]) -> List[int]:
        return sorted(idxs, key=lambda i: (boxes[i][1], boxes[i][0]))

    # main flow: XY-cut (vertical first) over main blocks, with the
    # PaddleX overlap-shrinking pre-pass so touching blocks still cut
    if main:
        mb = boxes[main]
        mb = shrink_overlapping_boxes(mb, axis=1)
        mb = shrink_overlapping_boxes(mb, axis=0)
        order_rel = sort_by_xycut(list(mb), SortDirection.VERTICAL, 1)
        main_sorted = [main[i] for i in order_rel]
    else:
        main_sorted = []

    # vision titles: insert next to their nearest vision block
    # (associate_child_blocks, layout_sorting.rs:669)
    for vt in by_y(visions_titles):
        best, best_d = None, None
        vx0, vy0, vx1, vy1 = boxes[vt]
        vcx, vcy = (vx0 + vx1) / 2, (vy0 + vy1) / 2
        for pos, i in enumerate(main_sorted):
            if labels[i] != OrderLabel.VISION:
                continue
            x0, y0, x1, y1 = boxes[i]
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            d = abs(cx - vcx) + abs(cy - vcy)
            if best_d is None or d < best_d:
                best, best_d = pos, d
        if best is None:
            main_sorted = _manhattan_insert(vt, main_sorted, boxes)
        else:
            # above the vision → before it; otherwise after
            if boxes[vt][1] <= boxes[main_sorted[best]][1]:
                main_sorted.insert(best, vt)
            else:
                main_sorted.insert(best + 1, vt)

    # unordered blocks (seals, page numbers): weighted nearest insertion
    for u in by_y(unordered):
        main_sorted = _manhattan_insert(u, main_sorted, boxes)

    return (by_y(headers) + by_y(doc_titles) + main_sorted + by_y(footers))


def _manhattan_insert(idx: int, order: List[int],
                      boxes: np.ndarray) -> List[int]:
    """Insert after the nearest already-ordered block
    (layout_sorting.rs:729 manhattan_insert)."""

    if not order:
        return [idx]
    x0, y0, x1, y1 = boxes[idx]
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    best_pos, best_d = 0, None
    for pos, i in enumerate(order):
        bx0, by0, bx1, by1 = boxes[i]
        bcx, bcy = (bx0 + bx1) / 2, (by0 + by1) / 2
        d = abs(bcx - cx) + abs(bcy - cy)
        if best_d is None or d < best_d:
            best_pos, best_d = pos, d
    # before if clearly above the nearest block, else after
    near = order[best_pos]
    if cy < boxes[near][1]:
        out = order[:best_pos] + [idx] + order[best_pos:]
    else:
        out = order[: best_pos + 1] + [idx] + order[best_pos + 1:]
    return out

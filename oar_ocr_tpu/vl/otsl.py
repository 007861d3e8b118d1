"""OTSL → HTML conversion for VLM table output.

Re-expresses oar-ocr-vl/src/utils/table.rs (712 LoC): several VLM families
emit tables in OTSL (Open Table Structure Language) — cell tokens
``<fcel>`` (content cell), ``<ecel>`` (empty), ``<lcel>`` (merge with the
cell to the left), ``<ucel>`` (merge with the cell above), ``<xcel>``
(merge left+up), ``<ched>``/``<rhed>`` (column/row header cells), and
``<nl>`` row separators, with cell text following its token. The converter
builds the occupancy grid, resolves col/row spans, and emits HTML.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

_OTSL_TOKEN_RE = re.compile(
    r"<(fcel|ecel|lcel|ucel|xcel|nl|ched|rhed|srow)>")

_CELL_STARTERS = {"fcel", "ecel", "ched", "rhed", "srow"}


def needs_table_postprocess(text: str) -> bool:
    """True when the backend emitted OTSL rather than HTML
    (doc_parser.rs needs_table_postprocess)."""
    return bool(_OTSL_TOKEN_RE.search(text)) and "<table" not in text.lower()


def _tokenize(text: str) -> List[Tuple[str, str]]:
    """→ [(token, following_text)]."""
    out = []
    pos = 0
    matches = list(_OTSL_TOKEN_RE.finditer(text))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        out.append((m.group(1), text[m.end():end].strip()))
    return out


class _Cell:
    __slots__ = ("text", "rowspan", "colspan", "header")

    def __init__(self, text: str, header: bool):
        self.text = text
        self.rowspan = 1
        self.colspan = 1
        self.header = header


def otsl_to_html(text: str) -> str:
    """Convert one OTSL table string to a full HTML table."""

    tokens = _tokenize(text)
    # build grid of cell refs; each entry is (_Cell, is_origin)
    grid: List[List[Optional[Tuple[_Cell, bool]]]] = [[]]
    for tok, content in tokens:
        row = grid[-1]
        if tok == "nl":
            grid.append([])
        elif tok in _CELL_STARTERS:
            cell = _Cell(content if tok != "ecel" else "",
                         header=tok in ("ched", "rhed"))
            row.append((cell, True))
        elif tok == "lcel":
            # merge with the cell to the left
            origin = _origin_left(row)
            if origin is not None:
                origin.colspan += 1
                row.append((origin, False))
            else:
                row.append((_Cell("", False), True))
        elif tok == "ucel":
            origin = _origin_up(grid, len(row))
            if origin is not None:
                origin.rowspan += 1
                row.append((origin, False))
            else:
                row.append((_Cell("", False), True))
        elif tok == "xcel":
            origin = _origin_up(grid, len(row))
            if origin is None:
                origin = _origin_left(row)
            if origin is not None:
                row.append((origin, False))
            else:
                row.append((_Cell("", False), True))
    if grid and not grid[-1]:
        grid.pop()

    rows_html = []
    for row in grid:
        cells = []
        for cell, is_origin in row:
            if not is_origin:
                continue
            attrs = ""
            if cell.colspan > 1:
                attrs += f' colspan="{cell.colspan}"'
            if cell.rowspan > 1:
                attrs += f' rowspan="{cell.rowspan}"'
            tag = "th" if cell.header else "td"
            cells.append(f"<{tag}{attrs}>{cell.text}</{tag}>")
        rows_html.append("<tr>" + "".join(cells) + "</tr>")
    return "<table>" + "".join(rows_html) + "</table>"


def _origin_left(row) -> Optional[_Cell]:
    return row[-1][0] if row else None


def _origin_up(grid, col: int) -> Optional[_Cell]:
    if len(grid) < 2:
        return None
    prev = grid[-2]
    if col < len(prev):
        return prev[col][0]
    return None

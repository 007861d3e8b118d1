"""Result stitching: fuse OCR text into layout elements.

Re-expresses the reference's ResultStitcher (oar-ocr/src/oarocr/
stitching.rs:44-2395 — PP-StructureV3 fusion rules :6-13): each detected
text region is assigned to the layout element that best contains it;
element text is the concatenation of its regions in reading order; regions
matching no element become orphan text elements; Table and Seal elements
are excluded from OCR matching (:41-42) because their content comes from
their dedicated subsystems.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

from ..domain.structure import (LayoutElement, LayoutElementType, postprocess_text)
from ..domain.text_region import TextRegion
from ..processors.sorting import sort_quad_boxes_indices


@dataclass
class StitchConfig:
    """stitching.rs:44 StitchConfig."""

    min_overlap_ratio: float = 0.5       # IoA of region in element
    include_orphans: bool = True
    orphan_min_confidence: float = 0.0


class ResultStitcher:
    def __init__(self, cfg: StitchConfig = StitchConfig()):
        self.cfg = cfg

    def stitch(self, elements: List[LayoutElement],
               regions: Sequence[TextRegion],
               page_w: int, page_h: int) -> List[LayoutElement]:
        """Assign ``regions`` into ``elements`` (in place) and return the
        element list extended with orphan text elements."""

        matchable = [
            (i, el) for i, el in enumerate(elements)
            if el.element_type not in (LayoutElementType.TABLE,
                                       LayoutElementType.SEAL)
            and el.element_type.should_ocr
        ]
        el_boxes = np.array([el.xyxy for _, el in matchable], np.float32) \
            if matchable else np.zeros((0, 4), np.float32)

        assigned: List[List[TextRegion]] = [[] for _ in matchable]
        orphans: List[TextRegion] = []

        for region in regions:
            b = np.asarray(region.box, np.float32).reshape(-1, 2)
            rx0, ry0 = b.min(0)
            rx1, ry1 = b.max(0)
            area = max((rx1 - rx0) * (ry1 - ry0), 1e-6)
            best, best_ioa = -1, self.cfg.min_overlap_ratio
            for k in range(len(matchable)):
                x0, y0, x1, y1 = el_boxes[k]
                iw = max(0.0, min(rx1, x1) - max(rx0, x0))
                ih = max(0.0, min(ry1, y1) - max(ry0, y0))
                ioa = iw * ih / area
                if ioa > best_ioa or (ioa == best_ioa and best >= 0
                                      and _area(el_boxes[k]) < _area(el_boxes[best])):
                    best, best_ioa = k, ioa
            if best >= 0:
                assigned[best].append(region)
            else:
                orphans.append(region)

        for (idx, el), regs in zip(matchable, assigned):
            if not regs:
                continue
            order = sort_quad_boxes_indices([r.box for r in regs])
            regs = [regs[i] for i in order]
            el.text_regions = regs
            el.text = postprocess_text(
                "\n".join(r.text or "" for r in regs))

        out = list(elements)
        if self.cfg.include_orphans:
            for region in orphans:
                if (region.confidence or 0.0) < self.cfg.orphan_min_confidence:
                    continue
                if not (region.text or "").strip():
                    continue
                b = np.asarray(region.box, np.float32).reshape(-1, 2)
                box = np.array([b[:, 0].min(), b[:, 1].min(),
                                b[:, 0].max(), b[:, 1].max()], np.float32)
                out.append(LayoutElement(
                    element_type=LayoutElementType.TEXT, box=box,
                    score=float(region.confidence or 0.0),
                    text=region.text, text_regions=[region]))
        return out


def _area(b: np.ndarray) -> float:
    return max(float((b[2] - b[0]) * (b[3] - b[1])), 1e-6)

"""Domain types shared across pipelines.

Re-expresses the reference's domain layer types: ``TextRegion``
(oar-ocr/src/../domain/text_region.rs:10), `OAROCRResult`
(src/oarocr/result.rs:1-175).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class TextRegion:
    """One detected + recognized text region."""

    box: np.ndarray                      # (4,2) quad or (N,2) poly, image coords
    text: Optional[str] = None
    confidence: Optional[float] = None
    det_score: Optional[float] = None
    orientation_angle: Optional[int] = None   # 0 or 180 (line orientation)
    word_boxes: Optional[List[np.ndarray]] = None
    word_texts: Optional[List[str]] = None
    label: Optional[str] = None          # "formula" marks injected formula
                                         # spans (stitching.rs TextRegion.label)

    @property
    def is_formula(self) -> bool:
        return self.label == "formula"

    @property
    def xyxy(self):
        b = np.asarray(self.box, np.float32).reshape(-1, 2)
        return (float(b[:, 0].min()), float(b[:, 1].min()),
                float(b[:, 0].max()), float(b[:, 1].max()))

    def to_dict(self) -> dict:
        return {
            "box": np.asarray(self.box).tolist(),
            "text": self.text,
            "confidence": self.confidence,
            "det_score": self.det_score,
            "orientation_angle": self.orientation_angle,
            "word_boxes": [np.asarray(b).tolist() for b in self.word_boxes]
            if self.word_boxes else None,
            "word_texts": self.word_texts,
        }


@dataclass
class OAROCRResult:
    """Full-pipeline result for one input image (result.rs:1-175)."""

    regions: List[TextRegion] = field(default_factory=list)
    source_path: Optional[str] = None
    width: int = 0
    height: int = 0
    orientation_angle: Optional[int] = None   # applied doc rotation
    rectified: bool = False
    error: Optional[str] = None

    @property
    def texts(self) -> List[str]:
        return [r.text or "" for r in self.regions]

    def to_dict(self) -> dict:
        return {
            "source_path": self.source_path,
            "width": self.width,
            "height": self.height,
            "orientation_angle": self.orientation_angle,
            "rectified": self.rectified,
            "error": self.error,
            "regions": [r.to_dict() for r in self.regions],
        }

"""DocParser: layout-first document parsing over any VLM backend.

Re-expresses oar-ocr-vl/src/doc_parser.rs:33-391 — the pipeline that runs
the classic layout detector (L5 predictor), sorts elements, crops regions,
and recognizes each region with a pluggable ``RecognitionBackend`` (the
VLM), mapping the layout element type to a recognition task
(RecognitionTask :33, backend trait :45, parse :141, parse_to_markdown
:391) and converting OTSL table output to HTML when the backend needs it
(utils/table.rs).
"""

from __future__ import annotations

import enum
from typing import List, Optional, Protocol, Sequence

import numpy as np

from ..domain.structure import (LayoutElement, LayoutElementType,
                                StructureResult, TableResult)
from ..models.detection.layout import LayoutDetector
from ..processors.layout_sorting import sort_layout_enhanced
from ..runtime.runtime import Runtime, stack_padded
from ..utils.tracing import stage_timer
from .otsl import needs_table_postprocess, otsl_to_html


class RecognitionTask(enum.Enum):
    """doc_parser.rs:33 RecognitionTask."""

    TEXT = "ocr"
    TABLE = "table"
    FORMULA = "formula"
    CHART = "chart"
    SEAL = "seal"


def task_for_element(t: LayoutElementType) -> Optional[RecognitionTask]:
    """Element type → recognition task (doc_parser.rs parse mapping).
    None means the region is not recognized (plain image)."""

    if t == LayoutElementType.TABLE:
        return RecognitionTask.TABLE
    if t.is_formula:
        return RecognitionTask.FORMULA
    if t == LayoutElementType.CHART:
        return RecognitionTask.CHART
    if t == LayoutElementType.SEAL:
        return RecognitionTask.SEAL
    if t.is_image_like:
        return None
    return RecognitionTask.TEXT


class RecognitionBackend(Protocol):
    """doc_parser.rs:45 — anything that turns region crops into text."""

    def recognize(self, images: Sequence[np.ndarray],
                  task: RecognitionTask) -> List[str]:
        ...


class VLMBackend:
    """RecognitionBackend over PaddleOCRVL (or compatible .generate)."""

    def __init__(self, vlm):
        self.vlm = vlm

    def recognize(self, images, task: RecognitionTask) -> List[str]:
        if not images:
            return []
        out = self.vlm.generate(list(images), task=task.value)
        return [r.text for r in out]


class DocParser:
    """Layout → crop → per-region VLM recognition → StructureResult."""

    def __init__(self, backend: RecognitionBackend, *,
                 layout: Optional[LayoutDetector] = None,
                 layout_variant: str = "pp-doclayout_plus-l",
                 runtime: Optional[Runtime] = None):
        self.runtime = runtime or Runtime.default()
        self.layout = layout or LayoutDetector(layout_variant,
                                               runtime=self.runtime)
        self.backend = backend

    def parse(self, image: np.ndarray) -> StructureResult:
        h, w = image.shape[:2]
        cfg = self.runtime.cfg
        pages = self.runtime.put(stack_padded(
            [image], (cfg.det_side_buckets.bucket(h),
                      cfg.det_side_buckets.bucket(w))))
        with stage_timer("docparser.layout"):
            boxes = self.layout.detect(pages, [(h, w)])[0]

        elements = [LayoutElement(
            element_type=LayoutElementType.from_label(b.label),
            box=b.box, score=b.score) for b in boxes]
        order = sort_layout_enhanced(elements, w, h)
        elements = [elements[i] for i in order]

        # group crops by task so each task is one batched VLM call
        by_task: dict = {}
        for idx, el in enumerate(elements):
            task = task_for_element(el.element_type)
            if task is None:
                continue
            x0, y0, x1, y1 = [int(v) for v in el.xyxy]
            crop = image[max(y0, 0):max(y1, y0 + 1),
                         max(x0, 0):max(x1, x0 + 1)]
            if crop.size == 0:
                continue
            by_task.setdefault(task, []).append((idx, np.ascontiguousarray(crop)))

        for task, items in by_task.items():
            with stage_timer(f"docparser.recognize[{task.value}]",
                             batch=len(items)):
                texts = self.backend.recognize([c for _, c in items], task)
            for (idx, _), text in zip(items, texts):
                el = elements[idx]
                if task == RecognitionTask.TABLE:
                    html = (otsl_to_html(text)
                            if needs_table_postprocess(text) else text)
                    el.table = TableResult(html=html)
                elif task == RecognitionTask.FORMULA:
                    el.formula_latex = text
                else:
                    el.text = text
        return StructureResult(elements=elements, width=w, height=h)

    def parse_to_markdown(self, image: np.ndarray) -> str:
        """doc_parser.rs:391."""
        return self.parse(image).to_markdown()

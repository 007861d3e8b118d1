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

    # PaddleOCR-VL outputs HTML directly (doc_parser.rs:467-469)
    needs_table_postprocess = False

    def __init__(self, vlm):
        self.vlm = vlm

    def recognize(self, images, task: RecognitionTask) -> List[str]:
        if not images:
            return []
        out = self.vlm.generate(list(images), task=task.value)
        return [r.text for r in out]


# Official per-backend task→prompt maps (doc_parser.rs RecognitionBackend
# impls: Hunyuan :487-498, GLM :533-537, MinerU :573-578).
HUNYUAN_TASK_PROMPTS = {
    RecognitionTask.TEXT: "Detect and recognize text in the image, and "
                         "output the text coordinates in a formatted "
                         "manner.",
    RecognitionTask.TABLE: "Parse the table in the image into HTML.",
    RecognitionTask.FORMULA: "Identify the formula in the image and "
                             "represent it using LaTeX format.",
    RecognitionTask.CHART: "Parse the chart in the image; use Mermaid "
                           "format for flowcharts and Markdown for other "
                           "charts.",
}
GLM_TASK_PROMPTS = {
    RecognitionTask.TEXT: "Text Recognition:",
    RecognitionTask.TABLE: "Table Recognition:",
    RecognitionTask.FORMULA: "Formula Recognition:",
    RecognitionTask.CHART: "Text Recognition:",
}
MINERU_TASK_PROMPTS = {
    RecognitionTask.TEXT: "\nText Recognition:",
    RecognitionTask.TABLE: "\nTable Recognition:",
    RecognitionTask.FORMULA: "\nFormula Recognition:",
    RecognitionTask.CHART: "\nDocument Parsing:",
}


def resize_for_mineru(image: np.ndarray, min_edge: int = 28,
                      max_aspect_ratio: float = 50.0) -> np.ndarray:
    """MinerU crop preprocessing (utils/image.rs:312 resize_for_mineru):
    pad extreme aspect ratios onto a centered white canvas, then scale up
    so the minimum edge meets the ViT patch-factor floor."""
    import cv2

    h, w = image.shape[:2]
    ratio = max(h, w) / max(min(h, w), 1)
    if ratio > max_aspect_ratio:
        if w > h:
            nh, nw = int(np.ceil(w / max_aspect_ratio)), w
        else:
            nh, nw = h, int(np.ceil(h / max_aspect_ratio))
        canvas = np.full((nh, nw, 3), 255, image.dtype)
        y, x = (nh - h) // 2, (nw - w) // 2
        canvas[y : y + h, x : x + w] = image
        image, h, w = canvas, nh, nw
    if min(h, w) < min_edge:
        scale = min_edge / min(h, w)
        image = cv2.resize(image, (int(np.ceil(w * scale)),
                                   int(np.ceil(h * scale))),
                           interpolation=cv2.INTER_LINEAR)
    return image


class FamilyBackend:
    """RecognitionBackend over a VLMFamily with an OFFICIAL per-task
    prompt map; GLM/MinerU flavors apply the reference's in-backend
    repetition truncation, MinerU additionally the small-crop resize."""

    def __init__(self, family, prompts, *, pre_resize: bool = False,
                 truncate: bool = False, max_new_tokens: int = 256,
                 needs_table_postprocess: bool = False):
        self.family = family
        self.prompts = prompts
        self.pre_resize = pre_resize
        self.truncate = truncate
        self.max_new_tokens = max_new_tokens
        # per-backend flag (doc_parser.rs:61): MinerU emits OTSL (true,
        # :596); Hunyuan/GLM emit HTML directly (false, :513/:553)
        self.needs_table_postprocess = needs_table_postprocess

    def recognize(self, images, task: RecognitionTask) -> List[str]:
        if not images:
            return []
        prompt = self.prompts.get(task, self.prompts[RecognitionTask.TEXT])
        imgs = [resize_for_mineru(im) if self.pre_resize else im
                for im in images]
        outs = self.family.generate(imgs, self.family.cfg.tasks[0],
                                    max_new_tokens=self.max_new_tokens,
                                    prompt=prompt)
        if self.truncate:
            from .sampling import truncate_repetition

            outs = [truncate_repetition(t, min_len=10,
                                        min_repeats=10).strip()
                    for t in outs]
        return outs


def glm_backend(family, **kw) -> FamilyBackend:
    """GLM-OCR DocParser backend (doc_parser.rs:525)."""
    return FamilyBackend(family, GLM_TASK_PROMPTS, truncate=True, **kw)


def mineru_backend(family, **kw) -> FamilyBackend:
    """MinerU2.5 DocParser backend (doc_parser.rs:565): official prompts
    + min-edge-28 crop resize + repetition truncation + OTSL table
    postprocess (doc_parser.rs:596)."""
    return FamilyBackend(family, MINERU_TASK_PROMPTS, pre_resize=True,
                         truncate=True, needs_table_postprocess=True, **kw)


def hunyuan_backend(family, **kw) -> FamilyBackend:
    """HunyuanOCR DocParser backend (doc_parser.rs:480) — like GLM it
    truncates degenerate repetition in-backend (:509-511)."""
    return FamilyBackend(family, HUNYUAN_TASK_PROMPTS, truncate=True, **kw)


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
                    # per-backend flag like doc_parser.rs:364 when the
                    # backend declares one; sniff the text otherwise
                    flag = getattr(self.backend,
                                   "needs_table_postprocess", None)
                    convert = (flag if flag is not None
                               else needs_table_postprocess(text))
                    html = otsl_to_html(text) if convert else text
                    el.table = TableResult(html=html)
                elif task == RecognitionTask.FORMULA:
                    el.formula_latex = text
                else:
                    el.text = text
        return StructureResult(elements=elements, width=w, height=h)

    def parse_to_markdown(self, image: np.ndarray) -> str:
        """doc_parser.rs:391."""
        return self.parse(image).to_markdown()

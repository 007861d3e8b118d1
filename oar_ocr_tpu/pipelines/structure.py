"""OARStructure: the full document-structure pipeline.

Re-expresses the reference's OARStructure/OARStructureBuilder
(oar-ocr/src/oarocr/structure.rs:128-3492): page preprocess → layout
detection (cross-page batched :3296) → formula recognition (batched across
pages :1914) → seal text → reading-order sort (:2077 xycut_enhanced) →
overall OCR (cross-page pooled :2821) → table analysis (:2604) → stitching
(:2800) → StructureResult with markdown/HTML/JSON export.

Stage order and batching follow the reference call stack (SURVEY §3.2).
The page batch is uploaded ONCE per predict and shared by every
page-frame stage — layout, overall OCR (pages_dev pass-through into
OAROCR.predict), OCR refinement, table analysis and the table-cell OCR
split. Only crop-frame stages (formula crops, seal OCR's poly detection
on crops) ship their own small crop batches, because they resample at a
different resolution than the page frame. Verified by
tests/test_structure_pipeline.py's upload-count test.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..domain.layout import LayoutBox
from ..domain.structure import (LayoutElement, LayoutElementType,
                                StructureResult, fix_element_labels,
                                remove_overlapping_elements)
from ..domain.text_region import TextRegion
from ..errors import InvalidInputError
from ..models.detection.layout import LayoutDetector
from ..processors.layout_sorting import sort_layout_enhanced
from ..runtime.runtime import Runtime
from ..utils.tracing import stage_timer
from .ocr import OAROCR, OAROCRBuilder
from .stitching import ResultStitcher
from .table_analyzer import TableAnalyzer, TableRegionInput


@dataclass
class OARStructureConfig:
    layout_variant: str = "pp-doclayout_plus-l"
    layout_score_thresh: float = 0.5
    image_batch_size: int = 4
    use_tables: bool = True
    use_formulas: bool = True
    use_seals: bool = True
    use_overall_ocr: bool = True
    use_region_blocks: bool = False     # PP-DocBlockLayout coarse regions
    use_doc_orientation: bool = False   # with_document_orientation
    use_doc_rectification: bool = False  # with_document_rectification
    use_textline_orientation: bool = False  # with_text_line_orientation
    use_table_orientation: bool = False  # with_table_orientation


class OARStructure:
    def __init__(self, *, layout: LayoutDetector, ocr: Optional[OAROCR],
                 tables: Optional[TableAnalyzer],
                 formulas=None, seal_ocr: Optional[OAROCR] = None,
                 region_detector: Optional[LayoutDetector] = None,
                 stitcher: Optional[ResultStitcher] = None,
                 preprocessor=None,
                 cfg: OARStructureConfig = OARStructureConfig(),
                 runtime: Optional[Runtime] = None):
        self.layout = layout
        self.ocr = ocr
        self.tables = tables
        self.formulas = formulas
        self.seal_ocr = seal_ocr
        self.region_detector = region_detector
        self.stitcher = stitcher or ResultStitcher()
        self.preprocessor = preprocessor
        self.cfg = cfg
        self.runtime = runtime or Runtime.default()

    # -------------------------------------------------------------
    def predict(self, images: Sequence[np.ndarray]) -> List[StructureResult]:
        """Multi-page batched structure analysis
        (predict_images, structure.rs:3249)."""

        if not images:
            return []
        for im in images:
            if im.ndim != 3 or im.shape[2] != 3 or im.dtype != np.uint8:
                raise InvalidInputError("images must be HWC uint8 RGB",
                                        shape=getattr(im, "shape", None))

        # --- optional document preprocessing: orientation upright +
        # rectification BEFORE everything else; downstream geometry is in
        # the preprocessed frame, never mapped back after rectification
        # (the preprocess.rs:10-12 invariant) ---
        if self.preprocessor is not None:
            with stage_timer("structure.preprocess", batch=len(images)):
                prepped = self.preprocessor.preprocess(list(images))
            images = [p.image for p in prepped]

        shapes = [im.shape[:2] for im in images]
        cfg = self.runtime.cfg
        ph = cfg.det_side_buckets.bucket(max(s[0] for s in shapes))
        pw = cfg.det_side_buckets.bucket(max(s[1] for s in shapes))
        with stage_timer("structure.upload"):
            pages = self.runtime.put_pages(list(images), (ph, pw))

        # --- layout detection in chunks (structure.rs:3296), with the
        # reference's fallback ladder: batched → single-page → empty
        # (structure.rs:3273-3275) ---
        from ..utils.tracing import logger

        layout_boxes: List[List[LayoutBox]] = []
        bs = self.cfg.image_batch_size
        for s in range(0, len(images), bs):
            idx = list(range(s, min(s + bs, len(images))))
            try:
                layout_boxes.extend(self.layout.detect(
                    pages, [shapes[i] for i in idx], page_indices=idx))
                if s == 0:
                    # first layout fetch depends on the page upload: free
                    # h2d bandwidth observation (runtime.h2d_checkpoint)
                    self.runtime.h2d_checkpoint()
            except Exception:
                for page_i in idx:
                    try:
                        layout_boxes.extend(self.layout.detect(
                            pages, [shapes[page_i]], page_indices=[page_i]))
                    except Exception:
                        logger.warning("layout failed for page %d", page_i,
                                       exc_info=True)
                        layout_boxes.append([])

        # --- optional coarse region blocks (PP-DocBlockLayout,
        # structure.rs:3322) ---
        page_regions: List[List] = [[] for _ in images]
        if self.region_detector is not None and self.cfg.use_region_blocks:
            from ..domain.structure import RegionBlock

            for s in range(0, len(images), bs):
                idx = list(range(s, min(s + bs, len(images))))
                for local_i, page_i in enumerate(idx):
                    det = self.region_detector.detect(
                        pages, [shapes[page_i]], page_indices=[page_i])[0]
                    page_regions[page_i] = [RegionBlock(box=b.box)
                                            for b in det]

        # --- build elements per page ---
        page_elements: List[List[LayoutElement]] = []
        for page_i, boxes in enumerate(layout_boxes):
            els = [LayoutElement(
                element_type=LayoutElementType.from_label(b.label),
                box=b.box, score=b.score, label=b.label,
                order_index=b.order_index)
                for b in boxes]
            els = remove_overlapping_elements(els)
            fix_element_labels(els)
            # region membership (structure.rs:2109): record each element's
            # enclosing coarse region
            for region in page_regions[page_i]:
                rx0, ry0, rx1, ry1 = [float(v) for v in region.box[:4]]
                for ei, el in enumerate(els):
                    x0, y0, x1, y1 = el.xyxy
                    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
                    if rx0 <= cx <= rx1 and ry0 <= cy <= ry1:
                        region.element_indices.append(ei)
            page_elements.append(els)

        # --- formulas batched across pages (structure.rs:1914) ---
        if self.formulas is not None and self.cfg.use_formulas:
            crops, owners = [], []
            for page_i, els in enumerate(page_elements):
                for el in els:
                    if el.element_type.is_formula:
                        x0, y0, x1, y1 = [int(v) for v in el.xyxy]
                        crop = images[page_i][max(y0, 0):y1, max(x0, 0):x1]
                        if crop.size:
                            crops.append(crop)
                            owners.append(el)
            if crops:
                with stage_timer("structure.formulas", batch=len(crops)):
                    for el, res in zip(owners, self.formulas.recognize(crops)):
                        el.formula_latex = res.latex

        # --- overall OCR, pooled across pages (structure.rs:2821) ---
        ocr_regions: List[List[TextRegion]] = [[] for _ in images]
        if self.ocr is not None and self.cfg.use_overall_ocr:
            # share the already-uploaded page batch: overall OCR slices
            # det chunks from it on device instead of re-uploading
            # (structure.rs:2821 cross-page precompute sharing)
            with stage_timer("structure.overall_ocr"):
                ocr_results = self.ocr.predict(list(images),
                                               pages_dev=pages)
            for page_i, r in enumerate(ocr_results):
                ocr_regions[page_i] = r.regions
            # refine against layout blocks (structure.rs:2484, :3209 —
            # runs for every page right after recognition; batched
            # across pages into one dispatch per wave)
            with stage_timer("structure.ocr_refine"):
                ocr_regions = self._refine_ocr_pages(
                    pages, shapes, ocr_regions, page_elements)

        # --- seal text, batched across pages (poly det preset;
        # detect_seal_text structure.rs:2009) ---
        if self.seal_ocr is not None and self.cfg.use_seals:
            seal_crops, seal_owners = [], []
            for page_i, els in enumerate(page_elements):
                for el in els:
                    if el.element_type != LayoutElementType.SEAL:
                        continue
                    x0, y0, x1, y1 = [int(v) for v in el.xyxy]
                    crop = images[page_i][max(y0, 0):y1, max(x0, 0):x1]
                    if crop.size:
                        seal_crops.append(np.ascontiguousarray(crop))
                        seal_owners.append(el)
            if seal_crops:
                with stage_timer("structure.seal", batch=len(seal_crops)):
                    res = self.seal_ocr.predict(seal_crops)
                for el, r in zip(seal_owners, res):
                    el.text = "\n".join(r.texts)

        # --- tables (structure.rs:2604-2659) ---
        if self.tables is not None and self.cfg.use_tables:
            inputs, owners = [], []
            for page_i, els in enumerate(page_elements):
                for el in els:
                    if el.element_type == LayoutElementType.TABLE:
                        x0, y0, x1, y1 = el.xyxy
                        # No OCR here: cell-text matching happens in the
                        # ResultStitcher AFTER the cross-cell split below
                        # (table_analyzer.rs:12; stitching.rs:105)
                        inputs.append(TableRegionInput(
                            page_index=page_i, box=(x0, y0, x1, y1)))
                        owners.append((page_i, el))
            if inputs:
                with stage_timer("structure.tables", batch=len(inputs)):
                    for (_, el), tr in zip(owners,
                                           self.tables.analyze_tables(
                                               pages, inputs)):
                        el.table = tr

            # --- 5b: split OCR boxes at table-cell boundaries and
            # re-recognize the fragments (structure.rs:2666-2685 →
            # split_ocr_bboxes_by_table_cells :1630-1846). Only when at
            # least one table has detection-backed cells, matching
            # has_detection_backed_table_cells (:2674). ---
            if self.ocr is not None:
                page_tables: List[List] = [[] for _ in images]
                for page_i, el in owners:
                    if el.table is not None:
                        page_tables[page_i].append(el.table)
                for page_i in range(len(images)):
                    trs = [t for t in page_tables[page_i] if not t.is_e2e]
                    if trs and ocr_regions[page_i]:
                        with stage_timer("structure.table_ocr_split",
                                         page=page_i):
                            ocr_regions[page_i] = \
                                self._split_regions_by_cells(
                                    pages, page_i, shapes[page_i],
                                    ocr_regions[page_i], trs)

        # --- stitch (sorts internally with stitched num_lines) per page
        # (structure.rs:2077, :2800) ---
        results: List[StructureResult] = []
        for page_i, els in enumerate(page_elements):
            h, w = shapes[page_i]
            stitched = self.stitcher.stitch(els, ocr_regions[page_i], w, h)
            results.append(StructureResult(
                elements=stitched, width=w, height=h))
        return results

    def predict_image(self, image: np.ndarray) -> StructureResult:
        """Single-page convenience (structure.rs:2808)."""
        return self.predict([image])[0]

    def predict_paths(self, paths: Sequence[str]) -> List[StructureResult]:
        """Path-based entry (structure.rs:2511 predict(image_path)):
        threaded decode then :meth:`predict`; results carry their
        source path."""
        from ..utils.image import load_images

        images, loaded = load_images(list(paths))
        results = self.predict(images)
        for r, p in zip(results, loaded):
            r.source_path = p
        return results

    # -------------------------------------------------------------
    def _refine_ocr_with_layout(self, pages, page_i: int, page_shape,
                                regions: List[TextRegion],
                                elements: List[LayoutElement]
                                ) -> List[TextRegion]:
        """Single-page convenience over :meth:`_refine_ocr_pages`."""
        n = int(pages.shape[0]) if hasattr(pages, "shape") else page_i + 1
        all_regions = [[] for _ in range(max(n, page_i + 1))]
        all_elements = [[] for _ in range(max(n, page_i + 1))]
        shapes = [page_shape] * len(all_regions)
        all_regions[page_i] = regions
        all_elements[page_i] = elements
        return self._refine_ocr_pages(pages, shapes, all_regions,
                                      all_elements)[page_i]

    def _refine_ocr_pages(self, pages, shapes,
                          ocr_regions: List[List[TextRegion]],
                          page_elements: List[List[LayoutElement]]
                          ) -> List[List[TextRegion]]:
        """Refine the overall OCR against layout blocks
        (structure.rs:1400-1630 refine_overall_ocr_with_layout), two
        waves, each ONE batched recognize_chunk dispatch pooled across
        ALL pages instead of the reference's per-crop adapter calls:

        1. every OCR box overlapping >1 non-excluded layout block
           (intersection w/h > 3 px, :1444) is re-recognized per
           intersection — the first valid crop replaces the region, the
           rest append; per OCR box, in order, existing regions covered
           by one of its crops (IoU > 0.8) lose their text (:1486) —
           replayed after recognition so a later box's suppression can
           null an earlier box's re-recognized text, like the
           reference's interleaving;
        2. non-excluded, non-image/chart layout blocks still textless
           after wave 1 get a whole-block fallback OCR (:1552).

        A page with no OCR regions or no layout elements is untouched
        (:1413-1415 early return). Regions whose text was suppressed
        stay in the list with ``text=None``, like the reference."""

        min_pixels = 3.0

        def excluded(t: LayoutElementType) -> bool:
            # :1429-1438 — specialized block types never match OCR
            return (t.is_formula or t == LayoutElementType.FORMULA_NUMBER
                    or t == LayoutElementType.TABLE
                    or t == LayoutElementType.SEAL)

        def inter_wh(a, b):
            return (min(a[2], b[2]) - max(a[0], b[0]),
                    min(a[3], b[3]) - max(a[1], b[1]))

        from ..processors.table import bbox_iou

        active = [p for p in range(len(ocr_regions))
                  if ocr_regions[p] and page_elements[p]]

        # ---- wave 1: multi-layout OCR boxes (:1462-1549) ----
        # per-page: [(region_idx, [(crop_box, plan_slot|None), ...])]
        plans: List = []
        page_work: dict = {}
        for p in active:
            regions = ocr_regions[p]
            elements = page_elements[p]
            el_boxes = [el.xyxy for el in elements]
            work = []
            for ri, r in enumerate(regions):
                rb = r.xyxy
                ids = []
                for li, eb in enumerate(el_boxes):
                    if excluded(elements[li].element_type):
                        continue
                    iw, ih = inter_wh(rb, eb)
                    if iw > min_pixels and ih > min_pixels:
                        ids.append(li)
                if len(ids) <= 1:
                    continue
                crops = []
                for j, li in enumerate(ids):
                    x0 = max(rb[0], el_boxes[li][0])
                    y0 = max(rb[1], el_boxes[li][1])
                    x1 = min(rb[2], el_boxes[li][2])
                    y1 = min(rb[3], el_boxes[li][3])
                    if x1 - x0 <= 1.0 or y1 - y0 <= 1.0:
                        continue                # aabb_intersection None
                    crop_box = (x0, y0, x1, y1)
                    plan = self._crop_plan(p, shapes[p], crop_box)
                    slot = None
                    if plan is not None:
                        slot = len(plans)
                        plans.append(plan)
                    crops.append((crop_box, slot, j == 0))
                if crops:
                    work.append((ri, crops))
            if work:
                page_work[p] = work

        decoded = []
        if plans:
            with stage_timer("structure.ocr_refine.multi",
                             batch=len(plans)):
                decoded = self.ocr.recognizer.recognize_chunk(pages, plans)

        # replay suppress→apply per OCR box in reference order (:1479)
        for p, work in page_work.items():
            regions = ocr_regions[p]
            appended: List[TextRegion] = []
            for ri, crops in work:
                for crop_box, _slot, _first in crops:
                    # suppress fully-covered existing text (:1486-1494)
                    for oi, other in enumerate(regions):
                        if oi != ri and bbox_iou(other.xyxy,
                                                 crop_box) > 0.8:
                            other.text = None
                for crop_box, slot, is_first in crops:
                    if slot is None:
                        continue
                    text, conf, _c = decoded[slot]
                    if not text:
                        continue                # :1522 empties skipped
                    x0, y0, x1, y1 = crop_box
                    quad = np.array([[x0, y0], [x1, y0], [x1, y1],
                                     [x0, y1]], np.float32)
                    if is_first:
                        regions[ri].box = quad  # replace in place (:1526)
                        regions[ri].text = text
                        regions[ri].confidence = conf
                    else:
                        appended.append(TextRegion(box=quad, text=text,
                                                   confidence=conf))
            ocr_regions[p] = list(regions) + appended

        # ---- wave 2: fallback OCR for textless blocks (:1552-1609) ----
        plans, owners = [], []      # owners: (page, el_box)
        for p in active:
            regions = ocr_regions[p]
            for el in page_elements[p]:
                t = el.element_type
                if excluded(t) or t in (LayoutElementType.IMAGE,
                                        LayoutElementType.CHART):
                    continue
                eb = el.xyxy
                has_text = False
                for r in regions:
                    if not (r.text or "").strip():
                        continue
                    iw, ih = inter_wh(r.xyxy, eb)
                    if iw > min_pixels and ih > min_pixels:
                        has_text = True
                        break
                if has_text:
                    continue
                plan = self._crop_plan(p, shapes[p], eb)
                if plan is None:
                    continue
                plans.append(plan)
                owners.append((p, eb))

        if plans:
            with stage_timer("structure.ocr_refine.fallback",
                             batch=len(plans)):
                decoded = self.ocr.recognizer.recognize_chunk(pages, plans)
            # apply sequentially, re-checking has_text against the
            # GROWING list: the reference appends block B1's fallback
            # region before evaluating B2, so an overlapping later block
            # is satisfied by it (:1552-1609 per-block loop). Recognition
            # of a block that becomes satisfied is discarded (we batched
            # a superset to keep one dispatch).
            for (p, eb), (text, conf, _c) in zip(owners, decoded):
                if not text:
                    continue
                satisfied = False
                for r in ocr_regions[p]:
                    if not (r.text or "").strip():
                        continue
                    iw, ih = inter_wh(r.xyxy, eb)
                    if iw > min_pixels and ih > min_pixels:
                        satisfied = True
                        break
                if satisfied:
                    continue
                x0, y0, x1, y1 = eb
                ocr_regions[p].append(TextRegion(
                    box=np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
                                 np.float32),
                    text=text, confidence=conf))
        return ocr_regions

    @staticmethod
    def _crop_plan(page_i: int, page_shape, box_xyxy):
        """Integer-clamped CropPlan for an axis-aligned page box
        (BBoxCrop::crop_bounding_box's floor/ceil+clamp semantics);
        None for degenerate crops."""
        import math

        from ..models.recognition.recognizer import CropPlan

        img_h, img_w = int(page_shape[0]), int(page_shape[1])
        fx1, fy1, fx2, fy2 = box_xyxy
        x1 = min(max(int(math.floor(fx1)), 0), max(img_w - 1, 0))
        y1 = min(max(int(math.floor(fy1)), 0), max(img_h - 1, 0))
        x2 = min(max(int(math.ceil(fx2)), 0), img_w)
        y2 = min(max(int(math.ceil(fy2)), 0), img_h)
        if x2 - x1 <= 1 or y2 - y1 <= 1:
            return None
        quad = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]],
                        np.float32)
        return CropPlan.from_quad(page_i, quad)

    # -------------------------------------------------------------
    def _split_regions_by_cells(self, pages, page_i: int, page_shape,
                                regions: List[TextRegion],
                                tables) -> List[TextRegion]:
        """Split cross-cell OCR boxes and re-recognize the fragments
        (structure.rs:1630-1846). Fragment crops go back through the
        pooled recognizer machinery — one batched chunk per page instead
        of the reference's one adapter call per crop."""

        import math

        from ..models.recognition.recognizer import CropPlan
        from ..processors.table import split_ocr_boxes_by_cells

        cell_rows = [t.cell_boxes for t in tables
                     if t.cell_boxes is not None and len(t.cell_boxes)]
        if not cell_rows:
            return regions
        cells = np.concatenate([np.asarray(c, np.float32).reshape(-1, 4)
                                for c in cell_rows], axis=0)
        splits = split_ocr_boxes_by_cells(
            [r.xyxy for r in regions], cells)

        img_h, img_w = int(page_shape[0]), int(page_shape[1])
        plans: List[CropPlan] = []
        plan_boxes: List[np.ndarray] = []
        slots: List[int] = []           # position in new_regions per plan
        new_regions: List[Optional[TextRegion]] = []
        for region, segs in zip(regions, splits):
            if segs is None:
                new_regions.append(region)
                continue
            for (fx1, fy1, fx2, fy2) in segs:
                # integer crop coords, floor/ceil + clamp
                # (structure.rs:1786-1800); degenerate fragments dropped
                x1 = min(max(int(math.floor(fx1)), 0), max(img_w - 1, 0))
                y1 = min(max(int(math.floor(fy1)), 0), max(img_h - 1, 0))
                x2 = min(max(int(math.ceil(fx2)), 0), img_w)
                y2 = min(max(int(math.ceil(fy2)), 0), img_h)
                if x2 - x1 <= 1 or y2 - y1 <= 1:
                    continue
                quad = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]],
                                np.float32)
                plans.append(CropPlan.from_quad(page_i, quad))
                # the emitted region keeps the FLOAT split coords
                # (structure.rs:1826-1831 BoundingBox::from_coords)
                plan_boxes.append(np.array(
                    [[fx1, fy1], [fx2, fy1], [fx2, fy2], [fx1, fy2]],
                    np.float32))
                slots.append(len(new_regions))
                new_regions.append(None)

        if plans:
            decoded = self.ocr.recognizer.recognize_chunk(pages, plans)
            for slot, box, (text, conf, _cols) in zip(slots, plan_boxes,
                                                      decoded):
                if text:
                    new_regions[slot] = TextRegion(
                        box=box, text=text, confidence=conf)
        return [r for r in new_regions if r is not None]


class OARStructureBuilder:
    """Fluent builder (structure.rs:1336 OARStructureBuilder)."""

    def __init__(self):
        self._cfg = OARStructureConfig()
        self._runtime: Optional[Runtime] = None
        self._layout_params = None
        self._table_kw: dict = {}       # per-kind TableAnalyzer overrides
        self._formula_model_type = "default"

    def with_layout_variant(self, name: str) -> "OARStructureBuilder":
        self._cfg.layout_variant = name
        return self

    def with_runtime(self, runtime: Runtime) -> "OARStructureBuilder":
        self._runtime = runtime
        return self

    def with_tables(self, enable: bool = True) -> "OARStructureBuilder":
        self._cfg.use_tables = enable
        return self

    def with_formulas(self, enable: bool = True) -> "OARStructureBuilder":
        self._cfg.use_formulas = enable
        return self

    def with_seals(self, enable: bool = True) -> "OARStructureBuilder":
        self._cfg.use_seals = enable
        return self

    def with_overall_ocr(self, enable: bool = True) -> "OARStructureBuilder":
        self._cfg.use_overall_ocr = enable
        return self

    def with_region_blocks(self, enable: bool = True) -> "OARStructureBuilder":
        self._cfg.use_region_blocks = enable
        return self

    def with_doc_orientation(self, enable: bool = True) -> "OARStructureBuilder":
        """Upright pages before analysis (structure.rs
        with_document_orientation)."""
        self._cfg.use_doc_orientation = enable
        return self

    def with_doc_rectification(self, enable: bool = True) -> "OARStructureBuilder":
        """UVDoc unwarp before analysis (with_document_rectification);
        results stay in the rectified frame."""
        self._cfg.use_doc_rectification = enable
        return self

    def with_textline_orientation(self, enable: bool = True) -> "OARStructureBuilder":
        """180° text-line correction inside the overall OCR
        (with_text_line_orientation)."""
        self._cfg.use_textline_orientation = enable
        return self

    def with_table_orientation(self, enable: bool = True) -> "OARStructureBuilder":
        """Classify+de-rotate table crops before structure recognition
        (with_table_orientation)."""
        self._cfg.use_table_orientation = enable
        return self

    def with_wired_table_structure(self, model) -> "OARStructureBuilder":
        """Structure model used only for wired tables
        (with_wired_table_structure — SLANeXt_wired slot)."""
        self._table_kw["wired_structure"] = model
        return self

    def with_wireless_table_structure(self, model) -> "OARStructureBuilder":
        """Structure model used only for wireless tables
        (with_wireless_table_structure)."""
        self._table_kw["wireless_structure"] = model
        return self

    def with_wired_table_cell_detection(self, detector) -> "OARStructureBuilder":
        """Cell detector for wired tables
        (with_wired_table_cell_detection)."""
        self._table_kw["cell_detector"] = detector
        return self

    def with_wireless_table_cell_detection(self, detector) -> "OARStructureBuilder":
        """Cell detector for wireless tables
        (with_wireless_table_cell_detection)."""
        self._table_kw["wireless_cell_detector"] = detector
        return self

    def with_formula_model_type(self, model_type: str
                                ) -> "OARStructureBuilder":
        """"default" (functional re-expression, formula.py),
        "pp-formulanet-exact" (checkpoint-convertible -S topology) or
        "pp-formulanet-l-exact" (-L: Vary-ViT-B encoder + MBart-1024,
        pp_formulanet_exact.py)."""
        self._formula_model_type = model_type
        return self

    def with_table_structure_model_type(self, model_type: str
                                        ) -> "OARStructureBuilder":
        """"slanet" (default) or "slanet-exact" (checkpoint-convertible
        topology, models/recognition/slanet_exact.py)."""
        self._table_kw["structure_model_type"] = model_type
        return self

    def with_cells_to_html(self, enable: bool = True
                           ) -> "OARStructureBuilder":
        """Force table HTML to be reconstructed from DETECTED cell boxes
        instead of the structure decode's tokens
        (use_cells_trans_to_html, table_analyzer.rs:684)."""
        self._table_kw["use_cells_to_html"] = enable
        return self

    def build(self) -> OARStructure:
        runtime = self._runtime or Runtime.default()
        layout = LayoutDetector(
            self._cfg.layout_variant, self._layout_params,
            score_thresh=self._cfg.layout_score_thresh, runtime=runtime)
        region_detector = (LayoutDetector("pp-docblocklayout",
                                          score_thresh=0.4, runtime=runtime)
                           if self._cfg.use_region_blocks else None)
        ocr = None
        if self._cfg.use_overall_ocr:
            ob = OAROCRBuilder("general").with_runtime(runtime)
            if self._cfg.use_textline_orientation:
                ob = ob.with_textline_orientation()
            ocr = ob.build()
        preprocessor = None
        if self._cfg.use_doc_orientation or self._cfg.use_doc_rectification:
            from .preprocess import DocumentPreprocessor

            preprocessor = DocumentPreprocessor(
                use_orientation=self._cfg.use_doc_orientation,
                use_rectification=self._cfg.use_doc_rectification,
                runtime=runtime)
        table_ori = None
        if self._cfg.use_table_orientation:
            from ..models.classification.pp_lcnet import \
                doc_orientation_classifier

            table_ori = doc_orientation_classifier(runtime=runtime)
        tables = (TableAnalyzer(runtime=runtime, orientation=table_ori,
                                **self._table_kw)
                  if self._cfg.use_tables else None)
        formulas = None
        if self._cfg.use_formulas:
            if self._formula_model_type.startswith("pp-formulanet"):
                from ..models.recognition.pp_formulanet_exact import (
                    PPFormulaNetConfig, PPFormulaNetExactAdapter)

                fcfg = (PPFormulaNetConfig().large()
                        if "-l-" in self._formula_model_type
                        else None)
                formulas = PPFormulaNetExactAdapter(cfg=fcfg,
                                                    runtime=runtime)
            else:
                from ..models.recognition.formula import FormulaRecognizer

                formulas = FormulaRecognizer(runtime=runtime)
        seal_ocr = (OAROCRBuilder("seal").with_runtime(runtime).build()
                    if self._cfg.use_seals else None)
        return OARStructure(layout=layout, ocr=ocr, tables=tables,
                            formulas=formulas, seal_ocr=seal_ocr,
                            region_detector=region_detector,
                            preprocessor=preprocessor,
                            cfg=self._cfg, runtime=runtime)

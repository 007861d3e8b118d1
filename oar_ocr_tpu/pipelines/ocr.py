"""OAROCR: the full det→rec pipeline with builder API.

Re-expresses the reference's ``OAROCR``/``OAROCRBuilder``
(oar-ocr/src/oarocr/ocr.rs:66-1233): text-type detection presets
(:314-366), batched detection with per-image fallback (:561-592), global
cross-image crop pooling with flush at 4096 (:594-658), wh-ratio-sorted
recognition chunks (:802-897), and result assembly.

TPU-first structure of one `predict` call:
1. decode/accept host images, upload ONE padded uint8 page batch;
2. detection: host plans matrices → one jitted program per shape bucket →
   host contour geometry → sorted quads;
3. recognition: all crops pooled across pages, sorted by aspect ratio
   (ocr.rs:811) and chunked (:827); each chunk is one jitted
   warp+rec+CTC program keyed by (batch bucket, width bucket);
4. scatter texts back to per-page regions in detection order.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.constants import MAX_POOLED_CROPS
from ..core.types import BoxType, LimitType
from ..domain.text_region import OAROCRResult, TextRegion
from ..errors import (InvalidInputError, batch_item_error,
                      format_batch_error_message)
from ..models.detection.detector import DBDetector
from ..models.recognition.recognizer import CropPlan, CTCRecognizer
from ..ops.resize import DetResizeConfig
from ..processors.db_postprocess import DBPostProcessConfig
from ..processors.geometry import order_quad_points
from ..processors.sorting import sort_poly_boxes_indices, sort_quad_boxes_indices
from ..runtime.runtime import Runtime
from ..utils.tracing import logger, stage_timer

# Detection presets per text type (ocr.rs:314-366): (thresh, box_thresh,
# unclip_ratio, limit_side_len, limit_type, box_type).
TEXT_TYPE_PRESETS = {
    "general": (0.3, 0.6, 2.0, 960, LimitType.MAX, BoxType.QUAD),
    "table": (0.3, 0.4, 2.0, 960, LimitType.MAX, BoxType.QUAD),
    "seal": (0.2, 0.6, 0.5, 736, LimitType.MIN, BoxType.POLY),
}


@dataclass
class OAROCRConfig:
    text_type: str = "general"
    image_batch_size: int = 8           # det batch (accelerator default, ocr.rs:264-274)
    region_batch_size: int = 64         # rec batch (accelerator default)
    min_det_score: float = 0.0
    use_doc_orientation: bool = False
    use_doc_rectification: bool = False
    use_textline_orientation: bool = False
    return_word_boxes: bool = False
    max_side_len: int = 4000


@dataclass
class _PredictState:
    """In-flight state between :meth:`OAROCR.predict_dispatch` (uploads +
    det dispatches issued) and :meth:`OAROCR.predict_collect`."""

    images: Sequence[np.ndarray]
    results: List[OAROCRResult]
    shapes: List = None
    unscaled_shapes: List = None
    orig_shapes: List = None
    page_scales: List = None
    pre_pages: Optional[List] = None
    det_pending: List = dataclasses.field(default_factory=list)


class OAROCR:
    """The assembled pipeline. Use :class:`OAROCRBuilder` to construct."""

    def __init__(self, detector: DBDetector, recognizer: CTCRecognizer,
                 cfg: OAROCRConfig, runtime: Optional[Runtime] = None,
                 preprocessor=None, line_orienter=None):
        self.detector = detector
        self.recognizer = recognizer
        self.cfg = cfg
        self.runtime = runtime or Runtime.default()
        self.preprocessor = preprocessor
        self.line_orienter = line_orienter

    # ------------------------------------------------------------------
    def predict_paths(self, paths: Sequence[str]) -> List[OAROCRResult]:
        """Path-based entry (ocr.rs predict_path / structure.rs:2511
        pattern): threaded decode (utils/image.py load_images) then
        :meth:`predict`; results carry their source path."""
        from ..utils.image import load_images

        images, loaded = load_images(list(paths))
        results = self.predict(images)
        for r, p in zip(results, loaded):
            r.source_path = p
        return results

    def predict(self, images: Sequence[np.ndarray], *,
                pages_dev=None) -> List[OAROCRResult]:
        """Run det+rec on a list of HWC uint8 RGB images.

        ``pages_dev``: optional already-uploaded padded (B, H, W, 3) uint8
        device batch covering ``images`` in order (OARStructure shares its
        page upload this way — structure.rs:2821's cross-page precompute
        shares loaded pages; a multi-page structure predict crosses the
        link once). Per-chunk det batches become device-side slices
        instead of fresh uploads. Requires no preprocessor and pages that
        fit ``max_side_len`` (the caller uploaded them at native size)."""
        state = self.predict_dispatch(images, pages_dev=pages_dev)
        return self.predict_collect(state)

    def predict_dispatch(self, images: Sequence[np.ndarray], *,
                         pages_dev=None) -> "_PredictState":
        """Phase 1 of :meth:`predict`: validate, preprocess, upload page
        chunks and dispatch every detection batch. Returns an opaque state
        for :meth:`predict_collect`. Splitting the phases lets a serving
        loop overlap batch N+1's upload+det dispatch with batch N's
        rec/collect (serving/engine.py double-buffering)."""

        if not images:
            return _PredictState(images=[], results=[])
        for im in images:
            if im.ndim != 3 or im.shape[2] != 3 or im.dtype != np.uint8:
                raise InvalidInputError(
                    "images must be HWC uint8 RGB",
                    shape=getattr(im, "shape", None),
                    dtype=str(getattr(im, "dtype", None)))

        # --- optional orientation / rectification chain ---
        orig_shapes = [im.shape[:2] for im in images]
        pre_pages = None
        if self.preprocessor is not None:
            pre_pages = self.preprocessor.preprocess(images)
            images = [p.image for p in pre_pages]
            pages_dev = None        # preprocessing changed the pixels

        # --- enforce max_side_len (ocr.rs caps at max_side_limit): pages
        # larger than the biggest det bucket would otherwise overflow
        # stack_padded. Downscale on host; boxes are scaled back at
        # assembly so results stay in the input frame. ---
        unscaled_shapes = [im.shape[:2] for im in images]
        page_scales = [1.0] * len(images)
        limit = self.cfg.max_side_len
        if any(max(s) > limit for s in unscaled_shapes):
            import cv2

            pages_dev = None        # downscale changes the pixels
            scaled = []
            for i, im in enumerate(images):
                side = max(im.shape[:2])
                if side > limit:
                    s = limit / side
                    nh = max(1, int(round(im.shape[0] * s)))
                    nw = max(1, int(round(im.shape[1] * s)))
                    im = cv2.resize(im, (nw, nh),
                                    interpolation=cv2.INTER_AREA)
                    page_scales[i] = s
                scaled.append(im)
            images = scaled

        shapes = [im.shape[:2] for im in images]
        cfg = self.runtime.cfg
        page_h = cfg.det_side_buckets.bucket(max(s[0] for s in shapes))
        page_w = cfg.det_side_buckets.bucket(max(s[1] for s in shapes))

        # --- detection, in image_batch_size chunks (ocr.rs:561-592).
        # Pages are uploaded PER det batch, interleaved with the det
        # dispatches: the device only waits for batch 0's upload; later
        # uploads ride the h2d link behind earlier batches' conv work. ---
        results: List[OAROCRResult] = [
            OAROCRResult(width=s[1], height=s[0]) for s in unscaled_shapes
        ]
        bs = self.cfg.image_batch_size
        if pages_dev is not None and tuple(pages_dev.shape[1:3]) != (
                page_h, page_w):
            pages_dev = None        # caller's bucket disagrees; re-upload
        det_pending = []   # (chunk page ids, pages_dev, det handle)
        for start in range(0, len(images), bs):
            chunk = list(range(start, min(start + bs, len(images))))
            if pages_dev is not None:
                # device-side slice of the shared upload: no host bytes
                # move; the slice fuses into the det program's prologue
                chunk_dev = pages_dev[start:start + len(chunk)]
            else:
                with stage_timer("ocr.upload", pages=len(chunk)):
                    chunk_dev = self.runtime.put_pages(
                        [images[i] for i in chunk], (page_h, page_w))
            det_pending.append((chunk, chunk_dev, self.detector.dispatch(
                chunk_dev, [shapes[i] for i in chunk])))
        return _PredictState(
            images=images, results=results, shapes=shapes,
            unscaled_shapes=unscaled_shapes, orig_shapes=orig_shapes,
            page_scales=page_scales, pre_pages=pre_pages,
            det_pending=det_pending)

    def predict_collect(self, state: "_PredictState") -> List[OAROCRResult]:
        """Phase 2 of :meth:`predict`: collect detection, pool + dispatch
        + collect recognition, assemble results."""
        if not state.images:
            return state.results
        images = state.images
        shapes = state.shapes
        unscaled_shapes = state.unscaled_shapes
        orig_shapes = state.orig_shapes
        page_scales = state.page_scales
        pre_pages = state.pre_pages
        results = state.results
        det_pending = state.det_pending
        per_page_boxes: List[List[np.ndarray]] = [[] for _ in images]
        per_page_scores: List[List[float]] = [[] for _ in images]
        # Streaming det→rec overlap: as soon as one det batch is
        # postprocessed, its pages' crops are pooled, ratio-sorted and the
        # rec chunks DISPATCHED — so the host geometry of later det batches
        # hides behind rec device work (the MAX_POOLED_CROPS flush of
        # ocr.rs:603 applied per det batch). Each det batch's rec
        # sub-batches are merged into ONE device array fetched on the
        # runtime's link thread (one tunnel RTT per det batch, overlapped
        # with the host work of later batches); all merged transfers are
        # joined at the end.
        rec_merged = []
        # Speculative det→rec (quad path): recognition dispatches on the
        # score-FREE candidate geometry and the device-score fetch (one
        # RTT) leaves the critical path — below-box_thresh candidates are
        # dropped at assembly, discarding their (device-cheap) rec work.
        # Bounded so a pathological page can't inflate rec batches.
        spec_pending: List[Tuple[List[int], tuple]] = []
        per_page_cand: dict = {}
        import os as _os

        spec_enabled = not _os.environ.get("OAR_TPU_NO_SPEC_REC")

        def _dispatch_pool(pool, pages_dev, host_chunk):
            # textline orientation for this pool (ocr.rs:755-788); crop
            # plans are indexed LOCAL to the det batch's page upload
            if self.line_orienter is not None and pool:
                quads = [(p.page_index, p.quad) for _, _, p in pool]
                cls = self.line_orienter.classify_quads(pages_dev, quads)
                for (page_i, region_i, plan), (c, _score) in zip(pool, cls):
                    if c == 1:
                        plan.matrix = _compose_rot180(
                            plan.matrix, plan.native_w, plan.native_h)
                        plan.flip180 = True
                        line_angles[(page_i, region_i)] = 180
                    else:
                        line_angles[(page_i, region_i)] = 0
            # ratio sort (ocr.rs:811) + fixed-size chunks (:827)
            order = sorted(range(len(pool)),
                           key=lambda i: pool[i][2].wh_ratio)
            rbs = self.cfg.region_batch_size
            pending = []
            for cs in range(0, len(order), rbs):
                chunk_ids = [pool[i] for i in order[cs : cs + rbs]]
                plans = [entry[2] for entry in chunk_ids]
                handle = self.recognizer.dispatch_chunk(
                    pages_dev, plans, host_images=host_chunk,
                    start_copy=False)
                pending.append((chunk_ids, plans, handle))
            if pending:
                rec_merged.append(self.recognizer.merge_dispatched(pending))

        line_angles: dict = {}
        # candidate-count bound for speculation: beyond ~40 candidates per
        # page the wasted rec compute on rejected boxes could outweigh the
        # saved RTT (max_candidates allows 1000/page)
        SPEC_MAX_CAND_PER_PAGE = 40

        def _consume_spec(chunk, pages_dev, cand) -> bool:
            """Speculative consume: pool + dispatch rec from score-free
            geometry. Returns False when this pending can't speculate
            (poly/slow path, error, too many candidates)."""
            if (cand[0] != "pending"
                    or cand[5] > SPEC_MAX_CAND_PER_PAGE * len(chunk)):
                return False
            try:
                geom = self.detector.finalize_geometry(cand)
            except Exception:
                return False
            if geom is None:
                return False
            host_chunk = [images[i] for i in chunk]
            pool: List[Tuple[int, int, CropPlan]] = []
            for local_i, page_i in enumerate(chunk):
                boxes, cand_idx = geom[local_i]
                # slots stay in CANDIDATE order here; the reading-order
                # sort runs on the score-filtered survivors at resolution
                # time, exactly like the non-speculative path — the
                # bubble pass in sort_quad_boxes_indices is
                # adjacency-sensitive, so sorting before filtering could
                # diverge from filter-then-sort (parity-critical)
                per_page_boxes[page_i] = boxes
                per_page_cand[page_i] = cand_idx
                for slot_i, box in enumerate(boxes):
                    quad = order_quad_points(box)
                    pool.append((page_i, slot_i,
                                 CropPlan.from_quad(local_i, quad)))
            while len(pool) > MAX_POOLED_CROPS:
                _dispatch_pool(pool[:MAX_POOLED_CROPS], pages_dev,
                               host_chunk)
                pool = pool[MAX_POOLED_CROPS:]
            if pool:
                _dispatch_pool(pool, pages_dev, host_chunk)
            spec_pending.append((chunk, cand))
            return True

        def _consume(chunk, pages_dev, cand):
            base = chunk[0]
            host_chunk = [images[i] for i in chunk]
            pool: List[Tuple[int, int, CropPlan]] = []
            try:
                if cand[0] == "error":
                    raise RuntimeError("det candidates failed")
                det_out = self.detector.finalize(cand)
            except Exception:
                # graceful degradation: batched detection falls back to
                # per-image on error (ocr.rs:576-588); single-image
                # failures yield empty results rather than failing the call
                det_out = []
                failures = []
                for page_i in chunk:
                    try:
                        det_out.extend(self.detector.detect(
                            pages_dev, [shapes[page_i]],
                            page_indices=[page_i - base]))
                    except Exception as exc:
                        failures.append((page_i, batch_item_error(
                            "detection", page_i, len(chunk), exc)))
                        det_out.append(([], []))
                if failures:
                    logger.warning(format_batch_error_message(
                        "detection", failures, len(chunk)))
            for local_i, page_i in enumerate(chunk):
                boxes, scores = det_out[local_i]
                order = (sort_quad_boxes_indices(boxes)
                         if self.detector.postprocess.cfg.box_type == BoxType.QUAD
                         else sort_poly_boxes_indices(boxes))
                per_page_boxes[page_i] = [boxes[i] for i in order]
                per_page_scores[page_i] = [scores[i] for i in order]
                for region_i, box in enumerate(per_page_boxes[page_i]):
                    quad = (order_quad_points(box) if box.shape == (4, 2)
                            else order_quad_points(_poly_to_quad(box)))
                    pool.append((page_i, region_i,
                                 CropPlan.from_quad(local_i, quad)))
            while len(pool) > MAX_POOLED_CROPS:
                _dispatch_pool(pool[:MAX_POOLED_CROPS], pages_dev,
                               host_chunk)
                pool = pool[MAX_POOLED_CROPS:]
            if pool:
                _dispatch_pool(pool, pages_dev, host_chunk)

        first_collect = True
        for chunk, pages_dev, handle in det_pending:
            try:
                cand = self.detector.collect_candidates(handle)
            except Exception:
                cand = ("error", handle)
            if first_collect:
                # batch 0's bitmap fetch depends on page chunk 0's
                # upload: its completion bounds the upload duration —
                # the free h2d bandwidth observation (runtime.py)
                self.runtime.h2d_checkpoint()
                first_collect = False
            if not (spec_enabled and _consume_spec(chunk, pages_dev, cand)):
                _consume(chunk, pages_dev, cand)

        texts: dict = {}
        word_box_map: dict = {}
        for merged_handle in rec_merged:
            for chunk_ids, plans, decoded in self.recognizer.collect_merged(
                    merged_handle):
                for (page_i, region_i, _), plan, (text, conf, cols) in zip(
                        chunk_ids, plans, decoded):
                    texts[(page_i, region_i)] = (text, conf)
                    if self.cfg.return_word_boxes and text:
                        from ..processors.word_boxes import word_boxes

                        wb = word_boxes(
                            plan.matrix, plan.native_w, plan.native_h,
                            plan.width, max((plan.width + 7) // 8, 1),
                            cols, text)
                        word_box_map[(page_i, region_i)] = wb

        # --- resolve speculative score filters: join the (long-finished)
        # scores fetches, drop below-box_thresh regions — their rec output
        # is discarded — and renumber the survivors so region order
        # matches the non-speculative path exactly ---
        box_thresh = self.detector.postprocess.cfg.box_thresh

        def _remap(d: dict, page_i: int, n_slots: int, kept: List[int]):
            old = {s: d.pop((page_i, s)) for s in range(n_slots)
                   if (page_i, s) in d}
            for new_i, s in enumerate(kept):
                if s in old:
                    d[(page_i, new_i)] = old[s]

        for chunk, cand in spec_pending:
            try:
                scores = self.detector.finalize_scores(cand)
            except Exception as exc:
                # graceful degradation (matches the non-speculative
                # ladder's terminal state): a dead scores fetch after
                # recognition already ran means the device/link failed —
                # the affected pages yield empty results, not a raised
                # predict
                logger.warning(format_batch_error_message(
                    "detection scoring", [(i, batch_item_error(
                        "detection", i, len(chunk), exc))
                        for i in chunk], len(chunk)))
                for page_i in chunk:
                    n_slots = len(per_page_cand.pop(page_i, []))
                    per_page_boxes[page_i] = []
                    per_page_scores[page_i] = []
                    _remap(texts, page_i, n_slots, [])
                    _remap(word_box_map, page_i, n_slots, [])
                    _remap(line_angles, page_i, n_slots, [])
                continue
            for page_i in chunk:
                cand_idx = per_page_cand.pop(page_i, [])
                n_slots = len(cand_idx)
                kept = [s for s in range(n_slots)
                        if float(scores[cand_idx[s]]) >= box_thresh]
                # reading-order sort on the SURVIVORS (filter-then-sort,
                # matching the non-speculative path exactly)
                order = sort_quad_boxes_indices(
                    [per_page_boxes[page_i][s] for s in kept])
                sel = [kept[i] for i in order]
                per_page_scores[page_i] = [
                    float(scores[cand_idx[s]]) for s in sel]
                per_page_boxes[page_i] = [
                    per_page_boxes[page_i][s] for s in sel]
                _remap(texts, page_i, n_slots, sel)
                _remap(word_box_map, page_i, n_slots, sel)
                _remap(line_angles, page_i, n_slots, sel)

        # --- assemble; map geometry back to the ORIGINAL frame when an
        # orientation correction was applied and no rectification broke the
        # mapping (ocr.rs:899, geometry.rs:848, preprocess.rs:10-12) ---
        from ..processors.geometry import rotate_points_back

        for page_i, res in enumerate(results):
            back_angle = None
            if pre_pages is not None:
                page = pre_pages[page_i]
                if page.orientation is not None:
                    res.orientation_angle = page.orientation.angle
                res.rectified = page.rectified
                if (page.orientation is not None
                        and page.orientation.angle != 0 and page.can_map_back):
                    # rotate_points_back takes the CCW rotation that WAS
                    # applied to upright the page (= the detected angle,
                    # preprocess.py) and inverts it (geometry.rs:848)
                    back_angle = page.orientation.angle % 360
                    res.height, res.width = orig_shapes[page_i]
            scale = page_scales[page_i]
            uw, uh = unscaled_shapes[page_i][1], unscaled_shapes[page_i][0]
            for region_i, box in enumerate(per_page_boxes[page_i]):
                text, conf = texts.get((page_i, region_i), ("", 0.0))
                wb = word_box_map.get((page_i, region_i))
                if scale != 1.0:
                    # back to the pre-downscale frame before any rotation
                    box = np.asarray(box, np.float32) / scale
                    if wb is not None:
                        wb = [(w, np.asarray(q, np.float32) / scale)
                              for w, q in wb]
                if back_angle is not None:
                    box = rotate_points_back(box, back_angle, uw, uh)
                if wb is not None and back_angle is not None:
                    wb = [(w, rotate_points_back(q, back_angle, uw, uh))
                          for w, q in wb]
                res.regions.append(TextRegion(
                    box=box, text=text, confidence=conf,
                    det_score=per_page_scores[page_i][region_i],
                    orientation_angle=line_angles.get((page_i, region_i)),
                    word_boxes=[q for _, q in wb] if wb else None,
                    word_texts=[w for w, _ in wb] if wb else None))
        return results


def _compose_rot180(matrix: np.ndarray, native_w: int,
                    native_h: int) -> np.ndarray:
    """Compose a 180° rotation into a native-crop sampling matrix
    (equivalent to the reference's crop rotate180, ocr.rs:785)."""

    f = np.array([[-1.0, 0.0, native_w - 1.0],
                  [0.0, -1.0, native_h - 1.0],
                  [0.0, 0.0, 1.0]], np.float64)
    return (matrix.astype(np.float64) @ f).astype(np.float32)


def _poly_to_quad(poly: np.ndarray) -> np.ndarray:
    """Min-area quad of a polygon box (for cropping poly detections)."""
    import cv2

    rect = cv2.minAreaRect(np.asarray(poly, np.float32))
    return cv2.boxPoints(rect).astype(np.float32)


def _load_weight_source(source):
    """path | registry name | ModelSource(path|bytes) → param tree
    (the ModelSource enum of core/inference/model_source.rs:21-28)."""
    from ..registry.models import resolve_model_path
    from ..runtime.weights import ModelSource, load_params

    if isinstance(source, ModelSource):
        return load_params(source)
    return load_params(resolve_model_path(str(source)))


def resolve_device_batch_sizes() -> Tuple[int, int]:
    """(image_batch, region_batch) defaults by device class
    (src/oarocr/builder_utils.rs resolve_device_batch_sizes + ocr.rs
    :264-274: accelerator det=8/rec=64, CPU image=1/region=16)."""

    import jax

    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon", "gpu", "cuda", "rocm"):
        return 8, 64
    return 1, 16


class OAROCRBuilder:
    """Fluent builder mirroring OAROCRBuilder (ocr.rs:438-1233)."""

    def __init__(self, text_type: str = "general"):
        if text_type not in TEXT_TYPE_PRESETS:
            raise InvalidInputError("unknown text_type", text_type=text_type)
        image_bs, region_bs = resolve_device_batch_sizes()
        self._cfg = OAROCRConfig(text_type=text_type,
                                 image_batch_size=image_bs,
                                 region_batch_size=region_bs)
        thresh, box_thresh, unclip, side, limit_type, box_type = (
            TEXT_TYPE_PRESETS[text_type])
        self._det_post = DBPostProcessConfig(
            thresh=thresh, box_thresh=box_thresh, unclip_ratio=unclip,
            box_type=box_type)
        self._det_resize = DetResizeConfig(
            limit_side_len=side, limit_type=limit_type)
        self._charset: Optional[Sequence[str]] = None
        self._det_params = None
        self._rec_params = None
        self._runtime: Optional[Runtime] = None
        self._use_mesh: Optional[bool] = None

    def with_det_config(self, **kwargs) -> "OAROCRBuilder":
        self._det_post = dataclasses.replace(self._det_post, **{
            k: v for k, v in kwargs.items()
            if k in {f.name for f in dataclasses.fields(DBPostProcessConfig)}})
        resize_keys = {f.name for f in dataclasses.fields(DetResizeConfig)}
        rk = {k: v for k, v in kwargs.items() if k in resize_keys}
        if rk:
            self._det_resize = dataclasses.replace(self._det_resize, **rk)
        return self

    def with_charset(self, charset: Sequence[str]) -> "OAROCRBuilder":
        self._charset = charset
        return self

    def with_charset_file(self, path: str) -> "OAROCRBuilder":
        from ..ops.ctc import load_charset

        self._charset = load_charset(path)
        return self

    def with_det_params(self, params) -> "OAROCRBuilder":
        self._det_params = params
        return self

    def with_rec_params(self, params) -> "OAROCRBuilder":
        self._rec_params = params
        return self

    def with_det_source(self, source) -> "OAROCRBuilder":
        """Detector weights from a filesystem path, a registry name, or
        an in-memory :class:`~oar_ocr_tpu.runtime.weights.ModelSource`
        (path|bytes — core/inference/model_source.rs:21-28)."""
        self._det_params = _load_weight_source(source)
        return self

    def with_rec_source(self, source) -> "OAROCRBuilder":
        """Recognizer weights from path / registry name / ModelSource."""
        self._rec_params = _load_weight_source(source)
        return self

    def with_runtime(self, runtime: Runtime) -> "OAROCRBuilder":
        self._runtime = runtime
        return self

    def with_mesh(self, enable: bool = True) -> "OAROCRBuilder":
        """Force the data-parallel device mesh on/off for this pipeline
        (default: auto — on when >1 real accelerator chip is visible).
        With the mesh active, every det/rec batch is sharded over the
        ``data`` axis; params and page uploads are replicated
        (SURVEY §2.7 — DP over ICI, the primary v5e-8 strategy)."""
        self._use_mesh = enable
        return self

    def with_batch_sizes(self, image: Optional[int] = None,
                         region: Optional[int] = None) -> "OAROCRBuilder":
        if image is not None:
            self._cfg.image_batch_size = image
        if region is not None:
            self._cfg.region_batch_size = region
        return self

    def with_doc_orientation(self, enable: bool = True) -> "OAROCRBuilder":
        self._cfg.use_doc_orientation = enable
        return self

    def with_doc_rectification(self, enable: bool = True) -> "OAROCRBuilder":
        self._cfg.use_doc_rectification = enable
        return self

    def with_textline_orientation(self, enable: bool = True) -> "OAROCRBuilder":
        self._cfg.use_textline_orientation = enable
        return self

    def with_word_boxes(self, enable: bool = True) -> "OAROCRBuilder":
        self._cfg.return_word_boxes = enable
        return self

    def build(self) -> OAROCR:
        runtime = self._runtime
        if runtime is None:
            if self._use_mesh is not None:
                from ..config.runtime import RuntimeConfig

                runtime = Runtime(RuntimeConfig(use_mesh=self._use_mesh))
            else:
                runtime = Runtime.default()
        detector = DBDetector(
            self._det_params, resize_cfg=self._det_resize,
            post_cfg=self._det_post, runtime=runtime)
        recognizer = CTCRecognizer(
            self._rec_params, charset=self._charset, runtime=runtime)
        preprocessor = None
        if self._cfg.use_doc_orientation or self._cfg.use_doc_rectification:
            from .preprocess import DocumentPreprocessor

            preprocessor = DocumentPreprocessor(
                use_orientation=self._cfg.use_doc_orientation,
                use_rectification=self._cfg.use_doc_rectification,
                runtime=runtime)
        line_orienter = None
        if self._cfg.use_textline_orientation:
            from ..models.classification.pp_lcnet import (
                textline_orientation_classifier)

            line_orienter = textline_orientation_classifier(runtime=runtime)
        return OAROCR(detector, recognizer, self._cfg, runtime,
                      preprocessor=preprocessor, line_orienter=line_orienter)

"""Single-task predictors: the 11 thin public per-task APIs.

Re-expresses the reference's predictor layer (oar-ocr-core/src/predictors/
mod.rs:50-72 — one thin predictor per task over `TaskPredictorCore`'s
validate → execute → validate contract, core.rs:19-69, with derived
builders). Every predictor validates its config (the ConfigValidator
analog), validates image inputs, runs the underlying model wrapper (which
owns the jitted device program), and returns typed outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Generic, List, Optional, Sequence, Tuple, TypeVar

import numpy as np

from ..config.validation import validate_config
from ..runtime.runtime import Runtime, stack_padded
from ..tasks.tasks import (ClassificationConfig, FormulaRecognitionConfig,
                           LayoutDetectionConfig, SealTextDetectionConfig,
                           TableStructureConfig, TaskType,
                           TextDetectionConfig, TextRecognitionConfig,
                           validate_images_input)

C = TypeVar("C")


class TaskPredictorCore(Generic[C]):
    """validate(config) at build; validate(input) → execute → output."""

    task: TaskType

    def __init__(self, config: C, runtime: Optional[Runtime] = None):
        validate_config(config)
        self.config = config
        self.runtime = runtime or Runtime.default()

    def _validate(self, images):
        validate_images_input(images, self.task.value)

    def _upload(self, images: Sequence[np.ndarray]):
        shapes = [im.shape[:2] for im in images]
        cfg = self.runtime.cfg
        h = cfg.det_side_buckets.bucket(max(s[0] for s in shapes))
        w = cfg.det_side_buckets.bucket(max(s[1] for s in shapes))
        return self.runtime.put(stack_padded(list(images), (h, w))), shapes


class TextDetectionPredictor(TaskPredictorCore[TextDetectionConfig]):
    task = TaskType.TEXT_DETECTION

    def __init__(self, config: TextDetectionConfig = TextDetectionConfig(),
                 params=None, runtime: Optional[Runtime] = None):
        super().__init__(config, runtime)
        from ..core.types import BoxType
        from ..models.detection.detector import DBDetector
        from ..ops.resize import DetResizeConfig
        from ..processors.db_postprocess import DBPostProcessConfig

        self._det = DBDetector(
            params,
            resize_cfg=DetResizeConfig(
                limit_side_len=config.limit_side_len,
                max_side_limit=config.max_side_limit),
            post_cfg=DBPostProcessConfig(
                thresh=config.thresh, box_thresh=config.box_thresh,
                unclip_ratio=config.unclip_ratio,
                max_candidates=config.max_candidates),
            runtime=self.runtime)

    def predict(self, images: Sequence[np.ndarray]
                ) -> List[Tuple[List[np.ndarray], List[float]]]:
        self._validate(images)
        return self._det.detect_images(images)


class SealTextDetectionPredictor(TaskPredictorCore[SealTextDetectionConfig]):
    task = TaskType.SEAL_TEXT_DETECTION

    def __init__(self, config: SealTextDetectionConfig = SealTextDetectionConfig(),
                 params=None, runtime: Optional[Runtime] = None):
        super().__init__(config, runtime)
        from ..core.types import BoxType, LimitType
        from ..models.detection.detector import DBDetector
        from ..ops.resize import DetResizeConfig
        from ..processors.db_postprocess import DBPostProcessConfig

        self._det = DBDetector(
            params,
            resize_cfg=DetResizeConfig(
                limit_side_len=config.limit_side_len,
                limit_type=LimitType.MIN),
            post_cfg=DBPostProcessConfig(
                thresh=config.thresh, box_thresh=config.box_thresh,
                unclip_ratio=config.unclip_ratio, box_type=BoxType.POLY),
            runtime=self.runtime)

    def predict(self, images):
        self._validate(images)
        return self._det.detect_images(images)


class TextRecognitionPredictor(TaskPredictorCore[TextRecognitionConfig]):
    """Recognize pre-cropped text-line images."""

    task = TaskType.TEXT_RECOGNITION

    def __init__(self, config: TextRecognitionConfig = TextRecognitionConfig(),
                 params=None, runtime: Optional[Runtime] = None):
        super().__init__(config, runtime)
        from ..models.recognition.recognizer import CTCRecognizer
        from ..ops.ctc import load_charset

        charset = (load_charset(config.charset_path)
                   if config.charset_path else None)
        self._rec = CTCRecognizer(params, charset=charset,
                                  use_space_char=config.use_space_char,
                                  reverse=config.reverse,
                                  runtime=self.runtime)

    def predict(self, images: Sequence[np.ndarray]
                ) -> List[Tuple[str, float]]:
        self._validate(images)
        from ..models.recognition.recognizer import CropPlan

        pages, shapes = self._upload(images)
        plans = []
        for i, (h, w) in enumerate(shapes):
            quad = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                            np.float32)
            plans.append(CropPlan.from_quad(i, quad))
        decoded = self._rec.recognize_chunk(pages, plans)
        out = [(t, c) for t, c, _ in decoded]
        if self.config.score_thresh > 0:
            out = [(t, c) if c >= self.config.score_thresh else ("", c)
                   for t, c in out]
        return out


class _ClassifierPredictor(TaskPredictorCore[ClassificationConfig]):
    _factory = None

    def __init__(self, config: ClassificationConfig = ClassificationConfig(),
                 params=None, runtime: Optional[Runtime] = None):
        super().__init__(config, runtime)
        self._cls = type(self)._factory(params, runtime=self.runtime)

    def predict(self, images: Sequence[np.ndarray]
                ) -> List[Tuple[int, float]]:
        self._validate(images)
        pages, shapes = self._upload(images)
        return self._cls.classify_pages(pages, shapes)


class DocumentOrientationPredictor(_ClassifierPredictor):
    task = TaskType.DOCUMENT_ORIENTATION
    from ..models.classification.pp_lcnet import doc_orientation_classifier
    _factory = staticmethod(doc_orientation_classifier)


class TextLineOrientationPredictor(_ClassifierPredictor):
    task = TaskType.TEXTLINE_ORIENTATION
    from ..models.classification.pp_lcnet import (
        textline_orientation_classifier)
    _factory = staticmethod(textline_orientation_classifier)


class TableClassificationPredictor(_ClassifierPredictor):
    task = TaskType.TABLE_CLASSIFICATION
    from ..models.classification.pp_lcnet import table_classifier
    _factory = staticmethod(table_classifier)


class DocumentRectificationPredictor(TaskPredictorCore):
    task = TaskType.DOCUMENT_RECTIFICATION

    def __init__(self, config=None, params=None,
                 runtime: Optional[Runtime] = None):
        from ..tasks.tasks import RectificationConfig

        super().__init__(config or RectificationConfig(), runtime)
        from ..models.rectification.uvdoc import UVDocRectifier

        self._rect = UVDocRectifier(params, runtime=self.runtime)

    def predict(self, images: Sequence[np.ndarray]) -> List[np.ndarray]:
        self._validate(images)
        return [self._rect.rectify(im) for im in images]


class LayoutDetectionPredictor(TaskPredictorCore[LayoutDetectionConfig]):
    task = TaskType.LAYOUT_DETECTION

    def __init__(self, config: LayoutDetectionConfig = LayoutDetectionConfig(),
                 params=None, runtime: Optional[Runtime] = None):
        super().__init__(config, runtime)
        from ..models.detection.layout import LayoutDetector

        self._det = LayoutDetector(
            config.variant, params, score_thresh=config.score_thresh,
            nms_iou=config.nms_iou, runtime=self.runtime)

    def predict(self, images: Sequence[np.ndarray]):
        self._validate(images)
        pages, shapes = self._upload(images)
        return self._det.detect(pages, shapes)


class TableCellDetectionPredictor(LayoutDetectionPredictor):
    task = TaskType.TABLE_CELL_DETECTION

    def __init__(self, config: Optional[LayoutDetectionConfig] = None,
                 params=None, runtime: Optional[Runtime] = None):
        cfg = config or LayoutDetectionConfig(
            variant="rt-detr-l_wired_table_cell_det", score_thresh=0.3)
        super().__init__(cfg, params, runtime)


class TableStructureRecognitionPredictor(TaskPredictorCore[TableStructureConfig]):
    task = TaskType.TABLE_STRUCTURE_RECOGNITION

    def __init__(self, config: TableStructureConfig = TableStructureConfig(),
                 params=None, runtime: Optional[Runtime] = None):
        super().__init__(config, runtime)
        from ..models.recognition.slanet import SLANetModel

        self._model = SLANetModel(params, max_steps=config.max_steps,
                                  runtime=self.runtime)

    def predict(self, images: Sequence[np.ndarray]):
        self._validate(images)
        pages, shapes = self._upload(images)
        regions = [(i, (0, 0, s[1], s[0])) for i, s in enumerate(shapes)]
        return self._model.recognize(pages, regions)


class FormulaRecognitionPredictor(TaskPredictorCore[FormulaRecognitionConfig]):
    task = TaskType.FORMULA_RECOGNITION

    def __init__(self, config: FormulaRecognitionConfig = FormulaRecognitionConfig(),
                 params=None, runtime: Optional[Runtime] = None):
        super().__init__(config, runtime)
        if config.model_type == "unimernet":
            from ..models.recognition.unimernet import UniMERNetRecognizer

            self._model = UniMERNetRecognizer(params, runtime=self.runtime)
        else:
            from ..models.recognition.formula import FormulaRecognizer

            self._model = FormulaRecognizer(params, max_len=config.max_len,
                                            runtime=self.runtime)

    def predict(self, images: Sequence[np.ndarray]):
        self._validate(images)
        return self._model.recognize(list(images))


ALL_PREDICTORS = {
    TaskType.TEXT_DETECTION: TextDetectionPredictor,
    TaskType.TEXT_RECOGNITION: TextRecognitionPredictor,
    TaskType.DOCUMENT_ORIENTATION: DocumentOrientationPredictor,
    TaskType.TEXTLINE_ORIENTATION: TextLineOrientationPredictor,
    TaskType.DOCUMENT_RECTIFICATION: DocumentRectificationPredictor,
    TaskType.LAYOUT_DETECTION: LayoutDetectionPredictor,
    TaskType.TABLE_CELL_DETECTION: TableCellDetectionPredictor,
    TaskType.TABLE_CLASSIFICATION: TableClassificationPredictor,
    TaskType.TABLE_STRUCTURE_RECOGNITION: TableStructureRecognitionPredictor,
    TaskType.FORMULA_RECOGNITION: FormulaRecognitionPredictor,
    TaskType.SEAL_TEXT_DETECTION: SealTextDetectionPredictor,
}

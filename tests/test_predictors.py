import numpy as np
import pytest

from oar_ocr_tpu.errors import ConfigError, InvalidInputError
from oar_ocr_tpu.tasks.tasks import (TASK_REGISTRY, LayoutDetectionConfig,
                                     TaskType, TextDetectionConfig,
                                     validate_images_input)


def test_registry_covers_all_11_tasks():
    assert len(TASK_REGISTRY) == 11
    assert set(TASK_REGISTRY) == set(TaskType)


def test_config_validation():
    from oar_ocr_tpu.config.validation import validate_config

    validate_config(TextDetectionConfig())
    with pytest.raises(ConfigError):
        validate_config(TextDetectionConfig(thresh=1.5))
    with pytest.raises(ConfigError):
        validate_config(TextDetectionConfig(max_candidates=0))
    with pytest.raises(ConfigError):
        validate_config(LayoutDetectionConfig(variant="nope"))
    with pytest.raises(ConfigError):
        validate_config(
            __import__("oar_ocr_tpu.tasks.tasks", fromlist=["x"])
            .TextRecognitionConfig(charset_path="/no/such/file"))


def test_validate_images_input():
    ok = [np.zeros((10, 10, 3), np.uint8)]
    validate_images_input(ok, "t")
    with pytest.raises(InvalidInputError):
        validate_images_input("nope", "t")
    with pytest.raises(InvalidInputError):
        validate_images_input([np.zeros((10, 10), np.uint8)], "t")
    with pytest.raises(InvalidInputError):
        validate_images_input([np.zeros((10, 10, 3), np.float32)], "t")


def test_text_detection_predictor(rng):
    from oar_ocr_tpu.predictors.predictors import TextDetectionPredictor

    p = TextDetectionPredictor(TextDetectionConfig(box_thresh=0.05))
    out = p.predict([rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)])
    assert len(out) == 1
    boxes, scores = out[0]
    assert len(boxes) == len(scores)
    with pytest.raises(InvalidInputError):
        p.predict([np.zeros((4, 4), np.uint8)])


def test_text_recognition_predictor(rng):
    from oar_ocr_tpu.predictors.predictors import TextRecognitionPredictor

    p = TextRecognitionPredictor()
    out = p.predict([rng.integers(0, 255, (48, 160, 3), dtype=np.uint8)])
    assert len(out) == 1
    text, conf = out[0]
    assert isinstance(text, str) and 0.0 <= conf <= 1.0


def test_textline_orientation_predictor(rng):
    from oar_ocr_tpu.predictors.predictors import TextLineOrientationPredictor

    p = TextLineOrientationPredictor()
    out = p.predict([rng.integers(0, 255, (40, 120, 3), dtype=np.uint8)])
    assert out[0][0] in (0, 1)


def test_all_predictors_mapping():
    from oar_ocr_tpu.predictors.predictors import ALL_PREDICTORS

    assert set(ALL_PREDICTORS) == set(TaskType)

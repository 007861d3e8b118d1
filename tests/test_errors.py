"""Typed error constructors (constructors.rs parity, VERDICT r1 weak #7)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.errors import (ConfigError, InferenceError, OCRError,
                                ProcessingError, ProcessingStage,
                                batch_item_error,
                                format_batch_error_message)


pytestmark = pytest.mark.fast


def test_staged_processing_constructors():
    e = ProcessingError.tensor_operation("bad reshape", shape=(2, 3))
    assert e.stage == ProcessingStage.TENSOR_OPERATION
    assert e.context["shape"] == (2, 3)
    assert "tensor_operation" in str(e)

    e = ProcessingError.resize("aspect underflow", src=(10, 2000),
                               dst=(48, 320))
    assert e.context["src_hw"] == (10, 2000)
    assert e.stage == ProcessingStage.RESIZE

    e = ProcessingError.batch_processing("item failed", batch_size=8,
                                         batch_index=3)
    assert e.context["batch_index"] == 3


def test_inference_builder_chains_cause():
    cause = RuntimeError("XLA OOM")
    e = (InferenceError.for_model("pp-ocrv5_mobile_det", "det.forward")
         .with_batch_index(2).with_input_shape((8, 960, 960, 3))
         .with_context("during warmup").build(cause))
    assert isinstance(e, InferenceError)
    assert e.__cause__ is cause
    assert e.context["input_shape"] == (8, 960, 960, 3)
    assert e.context["batch_index"] == 2
    assert e.context["model"] == "pp-ocrv5_mobile_det"


def test_config_constructors():
    e = ConfigError.for_field("box_thresh", 1.7, "must be in [0, 1]")
    assert e.context["value"] == 1.7
    e = ConfigError.validation("DBPostProcess", "max_candidates", ">0", 0)
    assert e.context["component"] == "DBPostProcess"
    e = ConfigError.resource_limit("kv_capacity", 16384, 20000)
    assert e.context["requested"] == 20000


def test_batch_aggregation():
    fails = [(1, ValueError("x")), (4, RuntimeError("y")),
             (5, ValueError("z")), (7, ValueError("w"))]
    wrapped = batch_item_error("detection", 1, 8, fails[0][1])
    assert isinstance(wrapped, ProcessingError)
    assert wrapped.__cause__ is fails[0][1]
    msg = format_batch_error_message("detection", fails, 8)
    assert "4/8" in msg and "#1" in msg and "+1 more" in msg
    assert format_batch_error_message("detection", [], 8).endswith(
        "succeeded")


def test_context_in_message():
    e = OCRError("boom", a=1, b="x")
    assert "a=1" in str(e) and "b='x'" in str(e)

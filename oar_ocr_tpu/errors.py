"""Error hierarchy for the TPU OCR framework.

TPU-native re-expression of the reference's ``OCRError`` enum
(reference: oar-ocr-core/src/core/errors/types.rs:110-170) and its rich
builder constructors (constructors.rs). In Python the natural shape is an
exception hierarchy with structured context attached, rather than an enum;
every variant of the Rust enum has a corresponding exception class here.
"""

from __future__ import annotations

from typing import Any, Mapping


class OCRError(Exception):
    """Base error. Carries structured ``context`` for observability.

    Mirrors the context-rich errors of the reference
    (oar-ocr-core/src/core/errors/types.rs:139-157 attaches input shapes and
    batch indices); we attach an arbitrary mapping.
    """

    def __init__(self, message: str, /, **context: Any):
        self.context: Mapping[str, Any] = dict(context)
        if context:
            ctx = ", ".join(f"{k}={v!r}" for k, v in context.items())
            message = f"{message} [{ctx}]"
        super().__init__(message)


class ImageLoadError(OCRError):
    """Failed to read or decode an input image (types.rs ImageLoad)."""


class ProcessingError(OCRError):
    """Pre/post-processing failure (types.rs Processing)."""


class InferenceError(OCRError):
    """Failure executing a compiled XLA program (types.rs Inference /
    ModelInference — a single class since there is one runtime here)."""


class InvalidInputError(OCRError):
    """Input validation failure (types.rs InvalidInput)."""


class ConfigError(OCRError):
    """Configuration validation failure (core/config/errors.rs)."""


class ModelLoadError(OCRError):
    """Weight loading / conversion failure (model_source.rs error paths)."""


class DownloadError(OCRError):
    """Model asset resolution failure (core/download/mod.rs)."""


class UnsupportedError(OCRError):
    """Feature not supported on this backend/configuration."""

"""oar_ocr_tpu — TPU-native document OCR & layout-analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Rust
`GreatV/oar-ocr` toolkit (reference mounted at /root/reference; see
SURVEY.md). Compute runs as jitted XLA programs with fused Pallas/gather
preprocessing; host code does geometry, planning, and orchestration only.
"""

__version__ = "0.1.0"

from .errors import (ConfigError, ImageLoadError, InferenceError,
                     InvalidInputError, ModelLoadError, OCRError,
                     ProcessingError)

__all__ = [
    "ConfigError", "ImageLoadError", "InferenceError", "InvalidInputError",
    "ModelLoadError", "OCRError", "ProcessingError",
]

"""oar_ocr_tpu — TPU-native document OCR & layout-analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Rust
`GreatV/oar-ocr` toolkit (reference mounted at /root/reference; see
SURVEY.md). Compute runs as jitted XLA programs with fused Pallas/gather
preprocessing; host code does geometry, planning, and orchestration only.

Primary entry points (imported lazily to keep `import oar_ocr_tpu` light):

    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
    from oar_ocr_tpu.pipelines.structure import OARStructureBuilder
    from oar_ocr_tpu.predictors.predictors import ALL_PREDICTORS
    from oar_ocr_tpu.vl.model import PaddleOCRVL
    from oar_ocr_tpu.vl.families import FAMILY_CLASSES
"""

__version__ = "0.1.0"

from .errors import (ConfigError, DownloadError, ImageLoadError,
                     InferenceError, InvalidInputError, ModelLoadError,
                     OCRError, ProcessingError, UnsupportedError)

__all__ = [
    "ConfigError", "DownloadError", "ImageLoadError", "InferenceError",
    "InvalidInputError", "ModelLoadError", "OCRError", "ProcessingError",
    "UnsupportedError",
]

"""Vision-language stack: PaddleOCR-VL + the family lineup.

    from oar_ocr_tpu.vl import PaddleOCRVL, DocParser, FAMILY_CLASSES
"""

from .model import ByteTokenizer, GenerationResult, HFTokenizer, PaddleOCRVL
from .paddleocr_vl import TASK_PROMPTS, PaddleOCRVLConfig

__all__ = [
    "ByteTokenizer", "GenerationResult", "HFTokenizer", "PaddleOCRVL",
    "PaddleOCRVLConfig", "TASK_PROMPTS",
]


def __getattr__(name):
    # lazy: families/doc_parser pull in the layout stack
    if name in ("FAMILY_CLASSES", "FAMILY_CONFIGS"):
        from . import families

        return getattr(families, name)
    if name == "DocParser":
        from .doc_parser import DocParser

        return DocParser
    raise AttributeError(name)

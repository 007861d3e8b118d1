"""Domain types: text regions, layout elements, structure results."""

from .layout import LAYOUT_VARIANTS, LayoutBox, LayoutVariant
from .structure import (LayoutElement, LayoutElementType,
                        PageContinuationFlags, RegionBlock, StructureResult,
                        TableResult, concatenate_markdown_pages,
                        postprocess_markdown, postprocess_text,
                        save_multi_page_results)
from .text_region import OAROCRResult, TextRegion

__all__ = [
    "LAYOUT_VARIANTS", "LayoutBox", "LayoutVariant", "LayoutElement",
    "LayoutElementType", "PageContinuationFlags", "RegionBlock",
    "StructureResult", "TableResult", "concatenate_markdown_pages",
    "postprocess_markdown", "postprocess_text", "save_multi_page_results",
    "OAROCRResult", "TextRegion",
]

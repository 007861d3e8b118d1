"""Domain types: text regions, layout elements, structure results."""

from .layout import LAYOUT_VARIANTS, LayoutBox, LayoutVariant
from .structure import (LayoutElement, LayoutElementType, RegionBlock,
                        StructureResult, TableResult,
                        concatenate_markdown_pages)
from .text_region import OAROCRResult, TextRegion

__all__ = [
    "LAYOUT_VARIANTS", "LayoutBox", "LayoutVariant", "LayoutElement",
    "LayoutElementType", "RegionBlock", "StructureResult", "TableResult",
    "concatenate_markdown_pages", "OAROCRResult", "TextRegion",
]

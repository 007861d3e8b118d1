"""PDF page rasterization for pipeline input.

The reference's examples render PDFs with the pure-Rust `hayro` crate
(examples/utils/pdf.rs:8,81). This environment ships no PDF rasterizer
(pymupdf/pypdfium2/pdf2image all absent), so the loader dispatches to the
first available backend and raises a structured error with guidance
otherwise — the pipelines themselves are PDF-agnostic (they consume HWC
uint8 pages).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..errors import UnsupportedError

_BACKENDS = ("pypdfium2", "fitz", "pdf2image")


def available_backend() -> Optional[str]:
    for name in _BACKENDS:
        try:
            __import__(name)
            return name
        except ImportError:
            continue
    return None


def render_pdf(path: str, *, dpi: int = 150,
               pages: Optional[List[int]] = None) -> List[np.ndarray]:
    """Rasterize a PDF to HWC uint8 RGB pages."""

    backend = available_backend()
    if backend is None:
        raise UnsupportedError(
            "no PDF rasterizer available; install pypdfium2 (preferred), "
            "PyMuPDF, or pdf2image, or pre-render pages to images",
            path=path)
    if backend == "pypdfium2":
        import pypdfium2 as pdfium

        doc = pdfium.PdfDocument(path)
        idxs = pages if pages is not None else range(len(doc))
        out = []
        for i in idxs:
            bitmap = doc[i].render(scale=dpi / 72.0)
            out.append(np.asarray(bitmap.to_pil().convert("RGB")))
        return out
    if backend == "fitz":
        import fitz

        doc = fitz.open(path)
        idxs = pages if pages is not None else range(doc.page_count)
        out = []
        for i in idxs:
            pix = doc[i].get_pixmap(dpi=dpi)
            arr = np.frombuffer(pix.samples, np.uint8).reshape(
                pix.height, pix.width, pix.n)
            out.append(arr[:, :, :3].copy())
        return out
    from pdf2image import convert_from_path

    imgs = convert_from_path(path, dpi=dpi)
    if pages is not None:
        imgs = [imgs[i] for i in pages]
    return [np.asarray(im.convert("RGB")) for im in imgs]

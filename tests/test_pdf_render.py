"""Built-in vector-PDF renderer (VERDICT r3 item 6): a digital-born PDF
authored in-test (no third-party PDF writer) must rasterize through
render_pdf's builtin path — text at the right place, filled paths,
strokes, multiple pages, object-stream files — and out-of-scope files
must fail with the actionable install hint (examples/utils/pdf.rs:8-81
is the reference capability being matched)."""

import zlib

import numpy as np
import pytest

pytestmark = pytest.mark.fast

from oar_ocr_tpu.errors import UnsupportedError  # noqa: E402
from oar_ocr_tpu.utils.pdf import render_pdf  # noqa: E402
from oar_ocr_tpu.utils.pdf_render import render_vector_pdf  # noqa: E402


def _classic_pdf(tmp_path, name="doc.pdf"):
    """Two-page classic-layout PDF: Flate content streams, Helvetica
    text (Tj + kerned TJ), a filled rect, a stroked line."""
    c1 = zlib.compress(b"""
q 0 0 0 rg BT /F1 24 Tf 72 700 Td (Hello Vector PDF) Tj ET
BT /F1 18 Tf 72 650 Td [(Kerned) -250 (Text)] TJ ET
0 0 0 rg 72 500 200 40 re f
0 0 1 RG 4 w 72 450 m 400 450 l S Q
""")
    c2 = zlib.compress(b"""
BT /F1 30 Tf 100 400 Td (Page Two) Tj ET
""")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"),
        4: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        5: b"<< /Length %d /Filter /FlateDecode >>" % len(c1),
        6: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 7 0 R >>"),
        7: b"<< /Length %d /Filter /FlateDecode >>" % len(c2),
    }
    streams = {5: c1, 7: c2}
    buf = bytearray(b"%PDF-1.5\n")
    for num in sorted(objs):
        buf += b"%d 0 obj\n" % num + objs[num]
        if num in streams:
            buf += b"\nstream\n" + streams[num] + b"\nendstream"
        buf += b"\nendobj\n"
    buf += b"trailer << /Size 8 /Root 1 0 R >>\n%%EOF\n"
    p = tmp_path / name
    p.write_bytes(bytes(buf))
    return str(p)


def _objstm_pdf(tmp_path):
    """Modern-layout PDF: catalog/pages/page/font dicts packed into a
    FlateDecode object stream (what Chrome/LaTeX emit)."""
    content = zlib.compress(
        b"BT /F1 20 Tf 50 300 Td (ObjStm Page) Tj ET\n"
        b"0 0 0 rg 50 100 150 30 re f\n")
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/MediaBox [0 0 400 400] >>"),      # inherited MediaBox
        (3, b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"),
        (4, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    header = b""
    body = b""
    for num, obj in inner:
        header += b"%d %d " % (num, len(body))
        body += obj + b" "
    payload = header + body
    comp = zlib.compress(payload)
    buf = bytearray(b"%PDF-1.6\n")
    buf += (b"10 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
            b"/Filter /FlateDecode >>\nstream\n"
            % (len(inner), len(header), len(comp)))
    buf += comp + b"\nendstream\nendobj\n"
    buf += (b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
            % len(content)) + content + b"\nendstream\nendobj\n"
    buf += b"trailer << /Root 1 0 R >>\n%%EOF\n"
    p = tmp_path / "objstm.pdf"
    p.write_bytes(bytes(buf))
    return str(p)


def _ink(img, r0, r1, c0, c1):
    region = img[r0:r1, c0:c1]
    return float((region < 128).any(axis=-1).mean())


def test_classic_vector_pdf_renders(tmp_path):
    path = _classic_pdf(tmp_path)
    pages = render_pdf(path, dpi=150)
    assert len(pages) == 2
    img = pages[0]
    s = 150 / 72.0
    h = img.shape[0]
    assert img.shape == (int(round(792 * s)), int(round(612 * s)), 3)
    # text baseline at (72, 700)pt: ink in the band above the baseline
    r_base = int(round(h - 700 * s))
    assert _ink(img, r_base - 60, r_base + 6, int(72 * s),
                int(400 * s)) > 0.02
    # filled rect (72, 500, 200x40)pt
    r0 = int(round(h - 540 * s)) + 2
    r1 = int(round(h - 500 * s)) - 2
    c0, c1 = int(round(72 * s)) + 2, int(round(272 * s)) - 2
    assert _ink(img, r0, r1, c0, c1) > 0.95
    # stroked blue line at y=450
    rl = int(round(h - 450 * s))
    band = img[rl - 6:rl + 6, int(100 * s):int(380 * s)]
    assert (band[:, :, 2] > 180).any() and (band[:, :, 0] < 120).any()
    # page 2 has its own text, upper area blank
    img2 = pages[1]
    r2 = int(round(h - 400 * s))
    assert _ink(img2, r2 - 70, r2 + 6, int(100 * s), int(350 * s)) > 0.02
    assert _ink(img2, 0, 100, 0, img2.shape[1]) == 0.0


def test_objstm_pdf_renders(tmp_path):
    pages = render_vector_pdf(_objstm_pdf(tmp_path), dpi=144)
    assert len(pages) == 1
    img = pages[0]
    s = 144 / 72.0
    assert img.shape[0] == int(round(400 * s))
    h = img.shape[0]
    # rect at (50, 100, 150x30)
    assert _ink(img, int(h - 130 * s) + 2, int(h - 100 * s) - 2,
                int(50 * s) + 2, int(200 * s) - 2) > 0.95
    # text at (50, 300)
    r = int(round(h - 300 * s))
    assert _ink(img, r - 45, r + 5, int(50 * s), int(250 * s)) > 0.02


def test_pages_subset_and_kerning_advance(tmp_path):
    path = _classic_pdf(tmp_path)
    only_second = render_pdf(path, dpi=100, pages=[1])
    assert len(only_second) == 1
    # page selection picked the page whose upper half is blank
    assert _ink(only_second[0], 0, 120, 0, only_second[0].shape[1]) == 0.0


def test_out_of_scope_raises_actionable(tmp_path):
    p = tmp_path / "junk.pdf"
    p.write_bytes(b"%PDF-1.4\nthis is not really a pdf body\n%%EOF")
    with pytest.raises(UnsupportedError):
        render_pdf(str(p))
    q = tmp_path / "not.pdf"
    q.write_bytes(b"hello")
    with pytest.raises(UnsupportedError):
        render_pdf(str(q))

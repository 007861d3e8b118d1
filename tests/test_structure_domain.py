import numpy as np
import pytest

from oar_ocr_tpu.domain.structure import (LayoutElement, LayoutElementType,
                                          PageContinuationFlags,
                                          StructureResult, TableResult,
                                          concatenate_markdown_pages,
                                          fix_element_labels,
                                          postprocess_markdown,
                                          postprocess_text,
                                          remove_overlapping_elements)


def _el(t, box, score=0.9, text=None):
    return LayoutElement(element_type=t, box=np.array(box, np.float32),
                         score=score, text=text)


def test_from_label():
    assert LayoutElementType.from_label("Paragraph Title") == \
        LayoutElementType.PARAGRAPH_TITLE
    assert LayoutElementType.from_label("doc-title") == LayoutElementType.DOC_TITLE
    assert LayoutElementType.from_label("wat") == LayoutElementType.UNKNOWN


def test_should_ocr_taxonomy():
    assert LayoutElementType.TEXT.should_ocr
    assert not LayoutElementType.TABLE.should_ocr
    assert not LayoutElementType.DISPLAY_FORMULA.should_ocr
    assert not LayoutElementType.SEAL.should_ocr
    assert LayoutElementType.PARAGRAPH_TITLE.should_ocr


def test_markdown_render():
    res = StructureResult(elements=[
        _el(LayoutElementType.DOC_TITLE, [0, 0, 100, 20], text="My Doc"),
        _el(LayoutElementType.TEXT, [0, 30, 100, 60], text="Hello world"),
        _el(LayoutElementType.HEADER, [0, 0, 100, 5], text="skip me"),
        _el(LayoutElementType.IMAGE, [0, 70, 100, 90]),
    ], width=100, height=100)
    md = res.to_markdown()
    assert "# My Doc" in md
    assert "Hello world" in md
    assert "skip me" not in md
    assert "imgs/img_in_image_box" in md    # centered img link


def test_markdown_table_and_formula():
    table = TableResult(html="<html><body><table><tr><td>x</td></tr>"
                             "</table></body></html>")
    res = StructureResult(elements=[
        LayoutElement(LayoutElementType.TABLE, np.zeros(4), 0.9, table=table),
        LayoutElement(LayoutElementType.DISPLAY_FORMULA, np.zeros(4), 0.9,
                      formula_latex="x^2"),
    ])
    md = res.to_markdown()
    assert '<table border="1">' in md and "$$x^2$$" in md


def test_html_render():
    res = StructureResult(elements=[
        _el(LayoutElementType.DOC_TITLE, [0, 0, 1, 1], text="T <x>"),
        _el(LayoutElementType.TEXT, [0, 0, 1, 1], text="body"),
    ])
    html = res.to_html()
    assert "<h1>T &lt;x&gt;</h1>" in html and "<p>body</p>" in html


def test_json_and_save(tmp_path):
    res = StructureResult(elements=[
        _el(LayoutElementType.TEXT, [0, 0, 1, 1], text="a")], width=5, height=7)
    j = res.to_json_value()
    assert j["width"] == 5 and j["elements"][0]["type"] == "text"
    paths = res.save_results(str(tmp_path), "p1")
    assert all((tmp_path / f"p1.{ext}").exists() for ext in ("md", "html", "json"))


def test_postprocess_text():
    assert postprocess_text("exam-\nple  text") == "example text"
    assert postprocess_text("  a \n b ") == "a b"


def test_concat_pages_continuation():
    a = StructureResult(
        elements=[_el(LayoutElementType.TEXT, [0, 0, 1, 1], text="first half")],
        continuation=PageContinuationFlags(ends_mid_paragraph=True))
    b = StructureResult(
        elements=[_el(LayoutElementType.TEXT, [0, 0, 1, 1], text="second half")],
        continuation=PageContinuationFlags(starts_mid_paragraph=True))
    md = concatenate_markdown_pages([a, b])
    assert "first half second half" in md


def test_remove_overlapping():
    els = [
        _el(LayoutElementType.TEXT, [0, 0, 100, 100], score=0.9),
        _el(LayoutElementType.TEXT, [10, 10, 30, 30], score=0.5),  # inside
        _el(LayoutElementType.TEXT, [200, 200, 250, 250], score=0.8),
    ]
    out = remove_overlapping_elements(els)
    assert len(out) == 2


def test_fix_labels_table_title():
    els = [
        _el(LayoutElementType.TITLE, [10, 10, 90, 25], text="Table 1"),
        _el(LayoutElementType.TABLE, [10, 40, 90, 100]),
    ]
    fix_element_labels(els)
    assert els[0].element_type == LayoutElementType.TABLE_TITLE

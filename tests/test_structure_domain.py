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


pytestmark = pytest.mark.fast


def _el(t, box, score=0.9, text=None):
    return LayoutElement(element_type=t, box=np.array(box, np.float32),
                         score=score, text=text)


def test_from_label():
    assert LayoutElementType.from_label("Paragraph Title") == \
        LayoutElementType.PARAGRAPH_TITLE
    assert LayoutElementType.from_label("doc-title") == LayoutElementType.DOC_TITLE
    assert LayoutElementType.from_label("wat") == LayoutElementType.UNKNOWN
    # "caption" | "figure_table_chart_title" → the combined caption type
    # (structure.rs:2124), a vision title for ordering/rendering
    assert LayoutElementType.from_label("caption") == \
        LayoutElementType.FIGURE_TABLE_CHART_TITLE
    assert LayoutElementType.FIGURE_TABLE_CHART_TITLE.is_caption


def test_markdown_excludes_footnote_and_empty_doc_title():
    """structure.rs:503-513: Footnote is an auxiliary label skipped by
    markdown; a DocTitle with text=None renders nothing (no bare '# ')."""
    from oar_ocr_tpu.domain.structure import StructureResult

    els = [
        _el(LayoutElementType.DOC_TITLE, [0, 0, 100, 20], text=None),
        _el(LayoutElementType.FOOTNOTE, [0, 90, 100, 99],
            text="a footnote"),
        _el(LayoutElementType.TEXT, [0, 30, 100, 60], text="body."),
    ]
    md = StructureResult(elements=els).to_markdown()
    assert "footnote" not in md
    assert "#" not in md
    assert "body." in md


def test_markdown_inline_formula_between_same_line_text():
    """A formula whose nearest neighbors on BOTH sides are same-line
    text renders inline ($...$ glued to the flow); one-sided alignment
    stays a display $$...$$ block (structure.rs:634-684)."""
    from oar_ocr_tpu.domain.structure import StructureResult

    def formula(box):
        e = _el(LayoutElementType.FORMULA, box)
        e.formula_latex = "x^2"
        return e

    inline = [
        _el(LayoutElementType.TEXT, [0, 100, 80, 120], text="left"),
        formula([90, 100, 140, 120]),
        _el(LayoutElementType.TEXT, [150, 100, 240, 120], text="right"),
    ]
    md = StructureResult(elements=inline).to_markdown()
    assert "$x^2$ " in md and "$$" not in md

    display = [
        _el(LayoutElementType.TEXT, [0, 40, 240, 60], text="above"),
        formula([60, 100, 180, 130]),
        _el(LayoutElementType.TEXT, [0, 160, 240, 180], text="below"),
    ]
    md2 = StructureResult(elements=display).to_markdown()
    assert "$$x^2$$" in md2


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


# ------- round-3 deep text postprocessing (structure.rs:1438-1807) -------

class TestDeepPostprocess:
    def test_dehyphenate_line_breaks_only(self):
        from oar_ocr_tpu.domain.markdown import dehyphenate
        assert dehyphenate("exam-\nple") == "example"
        assert dehyphenate("real-time") == "real-time"       # mid-word kept
        assert dehyphenate("end-\nEnd") == "end-\nEnd"       # uppercase kept
        assert dehyphenate("http://a-\nb.com") == "http://a-\nb.com"

    def test_fix_merged_words(self):
        from oar_ocr_tpu.domain.markdown import fix_merged_words
        assert fix_merged_words("encoder'sfeature") == "encoder's feature"
        assert fix_merged_words("modelThe") == "model The"
        assert fix_merged_words("48.1%AP") == "48.1% AP"
        assert fix_merged_words("RT-DETRv3") == "RT-DETRv3"  # no split

    def test_postprocess_text_sentence_boundary(self):
        assert postprocess_text("word.Next sentence") == "word. Next sentence"
        assert postprocess_text("pi is 3.14 ok") == "pi is 3.14 ok"
        assert postprocess_text("word .") == "word."

    def test_deduplicate_sections(self):
        from oar_ocr_tpu.domain.structure import deduplicate_sections
        md = "**Abstract**\ntext\n**Abstract**\nmore"
        assert deduplicate_sections(md) == "**Abstract**\ntext\nmore"

    def test_filter_empty_formulas(self):
        from oar_ocr_tpu.domain.structure import filter_empty_formulas
        assert filter_empty_formulas("$$\n$$\n\nx") == "x"
        kept = filter_empty_formulas("$$\nE=mc^2\n$$")
        assert "E=mc^2" in kept

    def test_postprocess_markdown_skips_protected_blocks(self):
        md = ("# head.Line\n\n```\ncode.Block stays\n```\n\n$$\na $ b\n$$\n\n"
              "plain.Text here")
        out = postprocess_markdown(md)
        assert "# head.Line" in out                     # heading untouched
        assert "code.Block stays" in out                # code untouched
        assert "a \\$ b" in out                         # $ escaped in math
        assert "plain. Text here" in out                # prose fixed


class TestContinuationFlags:
    def _page(self, x0, x1, width=1000):
        el = _el(LayoutElementType.TEXT, [x0, 10, x1, 40], text="t")
        return StructureResult(elements=[el], width=width, height=100)

    def test_calculated_flags(self):
        # starts at left edge → new paragraph; ends short of right → complete
        flags = self._page(10, 500).calculate_continuation_flags()
        assert not flags.starts_mid_paragraph and not flags.ends_mid_paragraph
        # indented start → mid-paragraph; runs to right edge → continues
        flags = self._page(200, 980).calculate_continuation_flags()
        assert flags.starts_mid_paragraph and flags.ends_mid_paragraph

    def test_concat_uses_calculated_flags(self):
        a = StructureResult(elements=[
            _el(LayoutElementType.TEXT, [10, 10, 980, 40], text="first")],
            width=1000, height=100)
        b = StructureResult(elements=[
            _el(LayoutElementType.TEXT, [300, 10, 500, 40], text="second")],
            width=1000, height=100)
        assert "first second" in concatenate_markdown_pages([a, b])

    def test_save_multi_page(self, tmp_path):
        from oar_ocr_tpu.domain.structure import save_multi_page_results
        pages = [StructureResult(elements=[
            _el(LayoutElementType.TEXT, [0, 0, 10, 10], text=f"p{i}")],
            width=100, height=100) for i in range(2)]
        paths = save_multi_page_results(pages, str(tmp_path), "doc")
        import os
        assert os.path.exists(paths["md"]) and os.path.exists(paths["json"])
        assert os.path.exists(tmp_path / "page_000" / "page.md")


def test_semantic_category():
    T = LayoutElementType
    assert T.DOC_TITLE.semantic_category == "title"
    assert T.CHART.semantic_category == "visual"
    assert T.FOOTNOTE.semantic_category == "footer"
    assert T.ALGORITHM.semantic_category == "special"


def test_filter_empty_formulas_blank_lines_between_markers():
    """Regression: an empty block with blank lines between $$ markers must
    drop BOTH markers (the reference's own skip loop leaves the closer,
    structure.rs:1706-1714 — fixed here)."""
    from oar_ocr_tpu.domain.structure import filter_empty_formulas
    out = filter_empty_formulas("$$\n\n$$\nSome text")
    assert "$$" not in out and "Some text" in out

"""VL text formatting + markdown export parity
(vl/text_format.py ← oar-ocr-vl/src/utils/text.rs tests :325-400 and
utils.rs:474-765 to_markdown/to_markdown_openocr) and the DocParser
wiring (doc_parser.rs:78-111 config, :190-219 filtering, :342-385
per-task postprocess)."""

import numpy as np
import pytest

from oar_ocr_tpu.domain.structure import (LayoutElement, LayoutElementType,
                                          TableResult)
from oar_ocr_tpu.vl.text_format import (
    DEFAULT_MARKDOWN_IGNORE_LABELS, _find_shortest_repeating_substring,
    clean_special_tokens, collapse_consecutive_spaces, fix_latex_brackets,
    format_formula, format_table, format_text,
    remove_space_before_punctuation, tighten_inline_dollar_math,
    to_markdown, to_markdown_openocr, truncate_repetitive_content)


pytestmark = pytest.mark.fast


def el(t, text=None, label=None, box=(0, 0, 100, 20), **kw):
    e = LayoutElement(element_type=t,
                      box=np.array(box, np.float32), score=0.9,
                      text=text, **kw)
    if label is not None:
        e.label = label
    return e


# ------------------------- text.rs tests -------------------------

def test_tighten_inline_dollar_math_basic():
    assert tighten_inline_dollar_math("$ x $") == "$x$"
    assert tighten_inline_dollar_math("$  y  $") == "$y$"
    assert tighten_inline_dollar_math("$x$") == "$x$"


def test_tighten_inline_dollar_math_display_untouched():
    assert tighten_inline_dollar_math("$$ x $$") == "$$ x $$"
    assert tighten_inline_dollar_math("$$  y  $$") == "$$  y  $$"


def test_tighten_inline_dollar_math_unmatched():
    assert tighten_inline_dollar_math("$100") == "$100"
    assert tighten_inline_dollar_math("price is $50") == "price is $50"


def test_tighten_inline_dollar_math_mixed():
    assert (tighten_inline_dollar_math("text $ x $ more $$ y $$ end")
            == "text $x$ more $$ y $$ end")
    assert (tighten_inline_dollar_math("price $100€$ and $ α $")
            == "price $100€$ and $α$")


def test_format_formula():
    assert format_formula("x + y = z") == "$$x + y = z$$"
    assert format_formula("\\[x^2\\]") == "$$x^2$$"
    # \upmu standardized, $ wrappers dropped, newline → latex break
    assert format_formula("$\\upmu$") == "$$\\mu$$"
    assert format_formula("a\nb") == "$$a\\\\\nb$$"


def test_fix_latex_brackets():
    assert fix_latex_brackets(r"\big{(}x\big{)}") == r"\big(x\big)"
    assert fix_latex_brackets(r"\Bigg{[}") == r"\Bigg["


def test_clean_special_tokens():
    assert clean_special_tokens("hello<|sn|>world") == "hello world"
    assert clean_special_tokens("test<|unk|>") == "test"
    assert clean_special_tokens("a-<|sn|>b") == "ab"


def test_format_table_fixups():
    out = format_table('<table>\n<tr>\n<tdcolspan="2"></td>\n</tr></table>')
    assert '<td colspan="2">' in out
    assert ">\n" not in out          # newlines after tags collapsed
    assert format_table(r"\(x\)") == "$x$"


def test_format_text():
    assert format_text(r"a \(x\) b") == "a $x$ b"
    assert format_text("x  ,  y .") == "x, y."
    assert format_text("dots......") == "dots..."
    assert format_text("____________") == "___"
    assert format_text(r"$\bullet$ item") == "• item"
    # table tags stripped in text mode
    assert "table" not in format_text("<table><tr><td>x</td></tr></table>")


def test_collapse_and_punct_helpers():
    assert collapse_consecutive_spaces("a   b\t c") == "a b\t c"
    assert remove_space_before_punctuation("x , y . z !") == "x, y. z!"


def test_truncate_repetitive_lines():
    text = "\n".join(["hello"] * 11)
    assert truncate_repetitive_content(text, 10, 10, 10) == "hello"


def test_truncate_repetitive_whole_string_period():
    s = "abcabcabcabcabcabcabcabcabcabc"  # 10 repeats of abc
    assert truncate_repetitive_content(s, 10, 10, 10) == "abc"
    assert _find_shortest_repeating_substring("綠洲綠洲綠洲") == "綠洲"
    assert _find_shortest_repeating_substring("hello") is None


def test_truncate_repeating_suffix_keeps_prefix():
    s = "intro text here " + "loremipsum" * 12   # >100 chars, >half tail
    out = truncate_repetitive_content(s, 10, 10, 10)
    # the reference returns the raw prefix without trimming (text.rs:269)
    assert out == "intro text here "


def test_truncate_leaves_normal_text():
    s = "a perfectly ordinary sentence"
    assert truncate_repetitive_content(s, 10, 10, 10) == s


# ------------------------- to_markdown -------------------------

def test_to_markdown_per_type_formatting():
    els = [
        el(LayoutElementType.DOC_TITLE, "Great\nPaper"),
        el(LayoutElementType.PARAGRAPH_TITLE, "Intro"),
        el(LayoutElementType.TEXT, "body \\(x\\) text"),
        el(LayoutElementType.FORMULA, "E = mc^2"),
        el(LayoutElementType.LIST, "first\n- second"),
        el(LayoutElementType.ALGORITHM, "for i in x:"),
    ]
    md = to_markdown(els)
    assert md.startswith("# Great Paper")
    assert "\n\n## Intro" in md
    assert "body $x$ text" in md
    assert "$$E = mc^2$$" in md
    assert "- first\n- second" in md
    assert "```\nfor i in x:\n```" in md


def test_to_markdown_skips_empty_and_ignored():
    els = [
        el(LayoutElementType.TEXT, "   "),
        el(LayoutElementType.TEXT, "kept"),
        el(LayoutElementType.FOOTER, "page 3", label="footer"),
    ]
    assert to_markdown(els) == "kept"


def test_to_markdown_figure_forms():
    md = to_markdown([el(LayoutElementType.IMAGE, "figures/a.png")])
    assert md == "![Figure 1](figures/a.png)"
    md = to_markdown([el(LayoutElementType.CHART, "a bar chart")])
    assert md == "*Figure 1: a bar chart*"
    md = to_markdown([el(LayoutElementType.IMAGE, "![x](y.png)")])
    assert md == "![x](y.png)"


def test_to_markdown_pulls_table_html_and_formula_latex():
    e = el(LayoutElementType.TABLE, None)
    e.table = TableResult(html="<table><tr><td>1</td></tr></table>")
    f = el(LayoutElementType.FORMULA, None)
    f.formula_latex = "x^2"
    md = to_markdown([e, f])
    assert "<table>" in md and "$$x^2$$" in md


# ---------------------- to_markdown_openocr ----------------------

def test_openocr_title_levels():
    md = to_markdown_openocr(
        [el(LayoutElementType.PARAGRAPH_TITLE, "1.2 Methods",
            label="paragraph_title")])
    # "1.2 Methods" has one dot → level 2 → "###"
    assert md.startswith("### 1.2 Methods")


def test_openocr_doc_title_and_text_block():
    els = [el(LayoutElementType.DOC_TITLE, "A\nTitle", label="doc_title"),
           el(LayoutElementType.TEXT, "line1\nline2", label="text")]
    md = to_markdown_openocr(els)
    assert md.startswith("# A Title")
    assert "line1\n\nline2" in md


def test_openocr_pretty_table_and_caption():
    t = el(LayoutElementType.TABLE,
           "<table><tr><td>v</td></tr></table>", label="table")
    cap = el(LayoutElementType.TABLE_TITLE, "Table 1", label="table_title")
    md = to_markdown_openocr([cap, t], pretty=True)
    assert '<div style="text-align: center;">Table 1</div>' in md
    assert "border=1 style='margin: auto" in md
    md_plain = to_markdown_openocr([cap, t], pretty=False)
    assert "Table 1" in md_plain and "<div" not in md_plain
    assert "border=1" not in md_plain


def test_openocr_abstract_and_reference_first_line():
    md = to_markdown_openocr(
        [el(LayoutElementType.ABSTRACT, "Abstract This paper ...",
            label="abstract")])
    assert md.startswith("## Abstract")
    md = to_markdown_openocr(
        [el(LayoutElementType.REFERENCE, "References\n[1] x",
            label="reference")])
    assert md.startswith("## References")


def test_openocr_ignores_default_labels():
    els = [el(LayoutElementType.HEADER, "running head", label="header"),
           el(LayoutElementType.TEXT, "kept", label="text")]
    assert "running head" not in to_markdown_openocr(els)
    assert "header" in DEFAULT_MARKDOWN_IGNORE_LABELS


# ---------------------- DocParser wiring ----------------------

def test_filter_overlap_boxes_and_pad_bbox():
    from oar_ocr_tpu.domain.layout import LayoutBox
    from oar_ocr_tpu.vl.doc_parser import filter_overlap_boxes, pad_bbox

    a = LayoutBox(box=np.array([0, 0, 100, 100], np.float32),
                  label="text", score=0.9)
    b = LayoutBox(box=np.array([10, 10, 50, 50], np.float32),
                  label="text", score=0.8)          # fully inside a
    c = LayoutBox(box=np.array([200, 0, 300, 100], np.float32),
                  label="reference", score=0.9)     # always dropped
    d = LayoutBox(box=np.array([5, 5, 60, 60], np.float32),
                  label="image", score=0.7)         # image exception
    kept = filter_overlap_boxes([a, b, c, d], 0.7)
    labels = [k.label for k in kept]
    assert labels == ["text", "image"]

    assert pad_bbox((10, 10, 30, 30), 100, 100, 0.5) == (0.0, 0.0, 40.0, 40.0)
    assert pad_bbox((0, 0, 100, 100), 100, 100, 0.5) == (0.0, 0.0, 100.0, 100.0)


def test_doc_parser_apply_generated_formats_per_task():
    from oar_ocr_tpu.vl.doc_parser import (DocParser, DocParserConfig,
                                           RecognitionTask)

    class Backend:
        needs_table_postprocess = False
        needs_repetition_truncation = True

        def recognize(self, images, task):
            return ["x"] * len(images)

    p = DocParser.__new__(DocParser)
    p.backend = Backend()
    p.config = DocParserConfig()

    e = el(LayoutElementType.FORMULA, None)
    p._apply_generated(e, RecognitionTask.FORMULA, "\\(x^2\\)")
    assert e.formula_latex == "$$x^2$$"
    assert e.text == "$$x^2$$"

    e = el(LayoutElementType.TABLE, None)
    p._apply_generated(e, RecognitionTask.TABLE,
                       " <table><tr><td>1</td></tr></table> ")
    assert e.table.html == "<table><tr><td>1</td></tr></table>"
    assert e.text == e.table.html

    # repetition truncation applied before formatting for text tasks
    e = el(LayoutElementType.TEXT, None)
    p._apply_generated(e, RecognitionTask.TEXT, "\n".join(["dup"] * 12))
    assert e.text == "dup"

    # empty generations leave the element untouched
    e = el(LayoutElementType.TEXT, None)
    p._apply_generated(e, RecognitionTask.TEXT, "   ")
    assert e.text is None


def test_doc_parser_config_defaults():
    from oar_ocr_tpu.vl.doc_parser import DocParserConfig

    cfg = DocParserConfig()
    assert cfg.crop_pad_ratio == 0.0
    # None = backend-tuned budgets; a fixed 4096 cap would cost the full
    # static lax.scan trip count here (see DocParserConfig docstring)
    assert cfg.max_tokens is None
    assert cfg.skip_auxiliary_regions and cfg.skip_region_blocks
    assert "footer" in cfg.markdown_ignore_labels

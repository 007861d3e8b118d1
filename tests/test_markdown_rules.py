"""Markdown rule-set parity (structure.rs:471-1731, VERDICT r1 #9)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.domain.markdown import (clean_ocr_text,
                                         format_as_bullet_list,
                                         format_content_block,
                                         format_first_line,
                                         format_text_block,
                                         format_title_with_level,
                                         format_vision_footnote_block,
                                         get_seg_flag, has_bullet_markers,
                                         image_markdown,
                                         image_markdown_name,
                                         infer_paragraph_title_levels,
                                         semantic_title_level_and_format,
                                         simplify_table_html)
from oar_ocr_tpu.domain.structure import (LayoutElement, LayoutElementType,
                                          StructureResult, TableResult)


pytestmark = pytest.mark.fast


def _el(t, box, text=None, score=0.9, **kw):
    return LayoutElement(element_type=t, box=np.asarray(box, np.float32),
                         score=score, text=text, **kw)


class TestTextRules:
    def test_blocks(self):
        assert clean_ocr_text("exam-\nple line\ntwo") == "example line two"
        assert format_text_block("a-\nb\nc") == "ab\n\nc"
        # the literal replace chain accumulates the soft-break
        # spaces on hyphen lines, like the reference's
        assert format_content_block("a-\nb\nc") == "a    \nb  \nc"
        assert format_vision_footnote_block("x\n\ny\nz") == "x\n\ny\n\nz"

    def test_first_line_keywords(self):
        out = format_first_line("abstract This paper", " ",
                                ("abstract", "摘要"), "## ")
        assert out.startswith("## abstract\n")
        out = format_first_line("References\n[1] x", "\n",
                                ("references",), "## ")
        assert out.startswith("## References\n")
        # non-matching first token untouched
        assert format_first_line("Intro text", " ", ("abstract",),
                                 "## ") == "Intro text"

    def test_bullets(self):
        assert has_bullet_markers("• one ▪ two")
        assert format_as_bullet_list("• one ▪ two") == "- one\n- two\n"


class TestTitles:
    def test_semantic_numbering_levels(self):
        assert semantic_title_level_and_format("1 Introduction") == \
            (2, "1 Introduction")
        assert semantic_title_level_and_format("1.2 Methods") == \
            (3, "1.2 Methods")
        assert semantic_title_level_and_format("1.2.3 Detail") == \
            (4, "1.2.3 Detail")
        assert semantic_title_level_and_format("ABSTRACT")[0] == 2

    def test_title_format_strips_trailing_dot(self):
        level, text = format_title_with_level("2. Background", None)
        assert level == 3 and text == "2 Background"

    def test_clustered_fallback(self):
        els = [
            _el(LayoutElementType.PARAGRAPH_TITLE, (0, 0, 100, 40),
                "Big Title", num_lines=1),
            _el(LayoutElementType.PARAGRAPH_TITLE, (0, 100, 100, 115),
                "small title", num_lines=1),
        ]
        levels = infer_paragraph_title_levels(els)
        assert levels[0] < levels[1]          # larger text → shallower


class TestSegFlag:
    def test_continuation(self):
        prev = _el(LayoutElementType.TEXT, (10, 0, 300, 50), "a",
                   num_lines=3, seg_end_x=298.0)
        cur = _el(LayoutElementType.TEXT, (10, 60, 300, 90), "b",
                  seg_start_x=11.0)
        assert get_seg_flag(cur, prev) is False     # continuation

    def test_indented_start_breaks(self):
        prev = _el(LayoutElementType.TEXT, (10, 0, 300, 50), "a",
                   num_lines=3, seg_end_x=298.0)
        cur = _el(LayoutElementType.TEXT, (10, 60, 300, 90), "b",
                  seg_start_x=60.0)                  # indented
        assert get_seg_flag(cur, prev) is True

    def test_single_line_prev_breaks(self):
        prev = _el(LayoutElementType.TEXT, (10, 0, 300, 50), "a",
                   num_lines=1, seg_end_x=298.0)
        cur = _el(LayoutElementType.TEXT, (10, 60, 300, 90), "b",
                  seg_start_x=11.0)
        assert get_seg_flag(cur, prev) is True


class TestMarkdownRender:
    def _page(self, elements, w=1000, h=1400):
        return StructureResult(width=w, height=h, elements=elements)

    def test_doc_title_keyword_demotion(self):
        md = self._page([_el(LayoutElementType.DOC_TITLE, (0, 0, 10, 10),
                             "References:")]).to_markdown()
        assert md.startswith("## References")
        md = self._page([_el(LayoutElementType.DOC_TITLE, (0, 0, 10, 10),
                             "A Real Title")]).to_markdown()
        assert md.startswith("# A Real Title")

    def test_table_centered_with_border(self):
        table = TableResult(html="<html><body><table><tr><td>x</td></tr>"
                                 "</table></body></html>")
        md = self._page([_el(LayoutElementType.TABLE, (0, 0, 10, 10),
                             table=table)]).to_markdown()
        assert '<table border="1">' in md
        assert md.startswith('<div style="text-align: center;">')
        assert "<html>" not in md

    def test_image_link_and_extraction(self, tmp_path):
        el = _el(LayoutElementType.IMAGE, (100, 100, 600, 300))
        page = self._page([el])
        md = page.to_markdown()
        name = image_markdown_name("image", (100, 100, 600, 300))
        assert name in md and 'width="50%"' in md
        img = np.zeros((1400, 1000, 3), np.uint8)
        img[100:300, 100:600] = 200
        n = page.extract_images(str(tmp_path), img)
        assert n == 1
        assert (tmp_path / name).exists()

    def test_text_overlapping_table_dropped(self):
        table = _el(LayoutElementType.TABLE, (0, 0, 500, 500),
                    table=TableResult(html="<table></table>"))
        inside = _el(LayoutElementType.TEXT, (10, 10, 490, 490),
                     "cell junk", score=0.5)
        outside = _el(LayoutElementType.TEXT, (10, 600, 490, 650),
                      "body text", score=0.5)
        md = self._page([table, inside, outside]).to_markdown()
        assert "cell junk" not in md
        assert "body text" in md

    def test_formula_dollar_normalization(self):
        md = self._page([_el(LayoutElementType.FORMULA, (0, 0, 9, 9),
                             formula_latex="$x^2$")]).to_markdown()
        assert "$$x^2$$" in md

    def test_continuation_glues_paragraphs(self):
        a = _el(LayoutElementType.TEXT, (10, 0, 300, 50), "first part",
                num_lines=3, seg_end_x=298.0)
        b = _el(LayoutElementType.TEXT, (10, 60, 300, 90), "second part",
                seg_start_x=11.0)
        md = self._page([a, b]).to_markdown()
        assert "first part" in md and "second part" in md
        assert "first part\n\nsecond part" not in md

    def test_seal_blockquote(self):
        md = self._page([_el(LayoutElementType.SEAL, (0, 0, 9, 9),
                             "OFFICIAL")]).to_markdown()
        assert "![Seal]" in md and "> OFFICIAL" in md

"""Structure-match evaluation helper — mirrors the reference's 9 tests
(oar-ocr-vl/examples/utils/structure_match.rs:199-360)."""

import numpy as np

from oar_ocr_tpu.domain.structure import (LayoutElement, LayoutElementType,
                                          StructureResult, TableResult)
from oar_ocr_tpu.utils.structure_match import (MatchThresholds, match_region)
import pytest

pytestmark = pytest.mark.fast

T = LayoutElementType


def _el(t, box, text=None, table=None, latex=None):
    return LayoutElement(element_type=t, box=np.array(box, np.float32),
                         score=0.9, text=text, table=table,
                         formula_latex=latex)


def _res(*els):
    return StructureResult(elements=list(els), width=100, height=100)


TH = MatchThresholds(same_category_iou=0.5, cross_category_iou=0.8,
                     allow_generic_fallback=False)


def test_same_category_beats_lower_iou_cross_category():
    # a text candidate with moderate IoU in the same category wins over a
    # table candidate with higher IoU in another category
    res = _res(_el(T.TEXT, (0, 0, 70, 100), text="same cat"),
               _el(T.FIGURE_TITLE, (0, 0, 95, 100), text="cross cat"))
    m = match_region(res, (0, 0, 100, 100), T.TEXT, TH)
    assert m is not None and m.text == "same cat" and m.same_category


def test_cross_category_only_at_strict_threshold():
    res = _res(_el(T.FIGURE_TITLE, (0, 0, 90, 100), text="caption text"))
    m = match_region(res, (0, 0, 100, 100), T.TEXT, TH)
    assert m is not None and m.text == "caption text"
    assert not m.same_category


def test_cross_category_below_strict_returns_none():
    res = _res(_el(T.FIGURE_TITLE, (0, 0, 70, 100), text="caption text"))
    assert match_region(res, (0, 0, 100, 100), T.TEXT, TH) is None


def test_region_target_skips_same_category_pass():
    # REGION's category carries no signal: only the strict pass applies
    res = _res(_el(T.REGION, (0, 0, 70, 100), text="region text"))
    assert match_region(res, (0, 0, 100, 100), T.REGION, TH) is None
    res2 = _res(_el(T.TEXT, (0, 0, 90, 100), text="strict text"))
    m = match_region(res2, (0, 0, 100, 100), T.REGION, TH)
    assert m is not None and not m.same_category


def test_table_target_uses_relaxed_threshold():
    table = TableResult(html="<table><tr><td>x</td></tr></table>")
    res = _res(_el(T.TABLE, (0, 0, 60, 100), table=table))
    m = match_region(res, (0, 0, 100, 100), T.TABLE, TH)
    assert m is not None and m.source == "table" and m.same_category
    assert "<table>" in m.text


def test_formula_target_uses_relaxed_threshold():
    res = _res(_el(T.FORMULA, (0, 0, 60, 100), latex="E=mc^2"))
    m = match_region(res, (0, 0, 100, 100), T.FORMULA, TH)
    assert m is not None and m.source == "formula" and m.text == "E=mc^2"


def test_table_no_generic_fallback_by_default():
    res = _res(_el(T.TEXT, (0, 0, 95, 100), text="| a | b |"))
    assert match_region(res, (0, 0, 100, 100), T.TABLE, TH) is None


def test_table_generic_fallback_when_enabled():
    th = MatchThresholds(0.5, 0.8, allow_generic_fallback=True)
    res = _res(_el(T.TEXT, (0, 0, 95, 100), text="| a | b |"))
    m = match_region(res, (0, 0, 100, 100), T.TABLE, th)
    assert m is not None and m.source == "layout"


def test_image_and_chart_targets_return_none():
    res = _res(_el(T.IMAGE, (0, 0, 100, 100), text="should not match"),
               _el(T.CHART, (0, 0, 100, 100), text="nor this"))
    for t in (T.IMAGE, T.CHART, T.HEADER_IMAGE, T.FOOTER_IMAGE):
        assert match_region(res, (0, 0, 100, 100), t, TH) is None

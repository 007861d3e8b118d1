"""Overall-OCR refinement against layout blocks
(pipelines/structure.py _refine_ocr_with_layout ← structure.rs:1400-1630
refine_overall_ocr_with_layout): cross-layout OCR boxes are split at
layout intersections and re-recognized; text-less layout blocks get a
fallback whole-block OCR pass."""

import jax.numpy as jnp
import numpy as np
import pytest

from oar_ocr_tpu.domain.structure import LayoutElement, LayoutElementType
from oar_ocr_tpu.domain.text_region import TextRegion
from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
from oar_ocr_tpu.pipelines.structure import OARStructure


def element(t, box):
    return LayoutElement(element_type=t,
                         box=np.array(box, np.float32), score=0.9)


def region(x0, y0, x1, y1, text, conf=0.9):
    return TextRegion(box=np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
                                   np.float32), text=text, confidence=conf)


@pytest.fixture(scope="module")
def pipe_and_pages():
    ocr = OAROCRBuilder("general").build()
    pipe = OARStructure(layout=None, ocr=ocr, tables=None)
    pages = jnp.zeros((1, 256, 512, 3), jnp.uint8)
    return pipe, pages


def _stub(monkeypatch, recognizer, texts_by_call):
    """Each recognize_chunk call pops the next list of texts; records the
    plans it saw."""
    calls = []

    def fake_rec(pages_u8, plans, host_images=None):
        calls.append(list(plans))
        texts = texts_by_call.pop(0)
        assert len(texts) == len(plans), (texts, len(plans))
        return [(t, 0.7, []) for t in texts]

    monkeypatch.setattr(recognizer, "recognize_chunk", fake_rec)
    return calls


def test_multi_layout_box_split_and_rerecognized(pipe_and_pages,
                                                 monkeypatch):
    """An OCR box spanning two text columns is re-recognized per
    intersection: first crop replaces the region, second appends
    (structure.rs:1479-1545)."""
    pipe, pages = pipe_and_pages
    els = [element(LayoutElementType.TEXT, (10, 10, 200, 100)),
           element(LayoutElementType.TEXT, (220, 10, 400, 100))]
    spanning = region(20, 40, 390, 60, "smeared")
    lonely = region(20, 70, 100, 90, "fine")
    calls = _stub(monkeypatch, pipe.ocr.recognizer,
                  [["left", "right"]])

    out = pipe._refine_ocr_with_layout(pages, 0, (256, 512),
                                       [spanning, lonely], els)
    # wave 1: two crops (one per layout); wave 2: nothing (both layouts
    # now have text)
    assert len(calls) == 1 and len(calls[0]) == 2
    texts = [r.text for r in out]
    assert texts == ["left", "fine", "right"]
    # the replaced region's box is the FIRST intersection
    x0, y0, x1, y1 = out[0].xyxy
    assert (x0, x1) == (20.0, 200.0)
    x0, _, x1, _ = out[2].xyxy
    assert (x0, x1) == (220.0, 390.0)


def test_covered_regions_suppressed(pipe_and_pages, monkeypatch):
    """Existing OCR fully covered by a re-recognized crop (IoU > 0.8)
    loses its text so it can't duplicate (structure.rs:1486-1494)."""
    pipe, pages = pipe_and_pages
    els = [element(LayoutElementType.TEXT, (10, 10, 200, 100)),
           element(LayoutElementType.TEXT, (220, 10, 400, 100))]
    spanning = region(20, 40, 390, 60, "smeared")
    # nearly identical to the first intersection crop → suppressed
    dup = region(21, 40, 199, 60, "dup")
    _stub(monkeypatch, pipe.ocr.recognizer, [["left", "right"]])

    out = pipe._refine_ocr_with_layout(pages, 0, (256, 512),
                                       [spanning, dup], els)
    assert [r.text for r in out if r.text] == ["left", "right"]


def test_later_box_suppresses_earlier_rerecognized_text(pipe_and_pages,
                                                        monkeypatch):
    """The suppress→apply sequence replays per OCR box in order
    (structure.rs:1479-1545 interleaving): a later multi-layout box
    whose crop covers an earlier box's REPLACED region nulls the
    earlier re-recognized text."""
    pipe, pages = pipe_and_pages
    els = [element(LayoutElementType.TEXT, (10, 10, 200, 100)),
           element(LayoutElementType.TEXT, (220, 10, 400, 100))]
    a = region(20, 20, 390, 40, "A")
    b = region(20, 22, 390, 42, "B")    # first crop covers a's (IoU>0.8)
    _stub(monkeypatch, pipe.ocr.recognizer,
          [["leftA", "rightA", "leftB", "rightB"]])

    out = pipe._refine_ocr_with_layout(pages, 0, (256, 512), [a, b], els)
    assert out[0].text is None          # leftA written, then nulled by b
    assert [r.text for r in out[1:]] == ["leftB", "rightA", "rightB"]


def test_fallback_ocr_for_textless_blocks(pipe_and_pages, monkeypatch):
    """A non-excluded layout block with no matched text gets whole-block
    OCR (structure.rs:1552-1609); image/chart and formula/table/seal
    blocks don't."""
    pipe, pages = pipe_and_pages
    els = [element(LayoutElementType.TEXT, (10, 10, 200, 100)),
           element(LayoutElementType.IMAGE, (220, 10, 400, 100)),
           element(LayoutElementType.TABLE, (10, 120, 200, 200)),
           element(LayoutElementType.SEAL, (220, 120, 400, 200))]
    far = region(450, 210, 490, 240, "elsewhere")   # overlaps no block
    calls = _stub(monkeypatch, pipe.ocr.recognizer, [["found text"]])

    out = pipe._refine_ocr_with_layout(pages, 0, (256, 512), [far], els)
    assert len(calls) == 1 and len(calls[0]) == 1   # only the TEXT block
    assert [r.text for r in out] == ["elsewhere", "found text"]
    x0, y0, x1, y1 = out[1].xyxy
    assert (x0, y0, x1, y1) == (10.0, 10.0, 200.0, 100.0)


def test_fallback_satisfied_by_earlier_fallback(pipe_and_pages,
                                                monkeypatch):
    """Two overlapping textless blocks: the reference appends B1's
    fallback region BEFORE evaluating B2, so B2 is satisfied by it
    (structure.rs:1552-1609 per-block loop). The batched superset must
    discard B2's recognition."""
    pipe, pages = pipe_and_pages
    els = [element(LayoutElementType.TEXT, (10, 10, 200, 100)),
           element(LayoutElementType.TEXT, (150, 10, 380, 100))]
    far = region(450, 210, 490, 240, "elsewhere")
    calls = _stub(monkeypatch, pipe.ocr.recognizer, [["one", "two"]])

    out = pipe._refine_ocr_with_layout(pages, 0, (256, 512), [far], els)
    assert len(calls) == 1 and len(calls[0]) == 2   # superset batched
    # only B1's result lands; B2 is satisfied by B1's appended region
    assert [r.text for r in out] == ["elsewhere", "one"]


def test_fallback_skipped_when_block_has_text(pipe_and_pages, monkeypatch):
    pipe, pages = pipe_and_pages
    els = [element(LayoutElementType.TEXT, (10, 10, 200, 100))]
    existing = region(20, 20, 100, 40, "already here")
    calls = _stub(monkeypatch, pipe.ocr.recognizer, [])

    out = pipe._refine_ocr_with_layout(pages, 0, (256, 512),
                                       [existing], els)
    assert calls == []                              # no dispatch at all
    assert [r.text for r in out] == ["already here"]


def test_empty_rec_keeps_original(pipe_and_pages, monkeypatch):
    """Empty re-recognition texts leave the original region untouched
    (structure.rs:1522-1524 skips empties; is_first never fires)."""
    pipe, pages = pipe_and_pages
    els = [element(LayoutElementType.TEXT, (10, 10, 200, 100)),
           element(LayoutElementType.TEXT, (220, 10, 400, 100))]
    spanning = region(20, 40, 390, 60, "smeared")
    # both rec results empty → wave 2 sees both blocks textless except
    # the original box still has its text (overlaps layout 0 and 1)
    _stub(monkeypatch, pipe.ocr.recognizer, [["", ""]])

    out = pipe._refine_ocr_with_layout(pages, 0, (256, 512),
                                       [spanning], els)
    assert [r.text for r in out] == ["smeared"]
    x0, _, x1, _ = out[0].xyxy
    assert (x0, x1) == (20.0, 390.0)                # box unchanged


def test_refine_noop_without_inputs(pipe_and_pages, monkeypatch):
    """structure.rs:1413 — EITHER empty OCR or empty layout skips the
    page entirely (no fallback block OCR on OCR-less pages)."""
    pipe, pages = pipe_and_pages
    calls = _stub(monkeypatch, pipe.ocr.recognizer, [])
    assert pipe._refine_ocr_with_layout(pages, 0, (256, 512), [], []) == []
    r = [region(1, 1, 9, 9, "x")]
    assert pipe._refine_ocr_with_layout(pages, 0, (256, 512), r, []) == r
    els = [element(LayoutElementType.TEXT, (10, 10, 200, 100))]
    assert pipe._refine_ocr_with_layout(pages, 0, (256, 512), [], els) == []
    assert calls == []

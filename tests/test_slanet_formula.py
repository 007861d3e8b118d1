import numpy as np
import pytest

from oar_ocr_tpu.models.recognition.slanet import (EOS_ID, SOS_ID,
                                                   TABLE_STRUCTURE_VOCAB,
                                                   decode_structure)


def _ids(*tokens):
    return np.array([TABLE_STRUCTURE_VOCAB.index(t) for t in tokens])


class TestStructureDecode:
    def test_stops_at_eos(self):
        ids = np.concatenate([_ids("<tr>", "<td></td>", "</tr>"),
                              [EOS_ID], _ids("<td></td>")])
        conf = np.ones(len(ids))
        locs = np.zeros((len(ids), 8), np.float32)
        toks, boxes, scores = decode_structure(ids, conf, locs)
        assert toks == ["<tr>", "<td></td>", "</tr>"]
        assert len(boxes) == 1

    def test_skips_sos(self):
        ids = np.array([SOS_ID, TABLE_STRUCTURE_VOCAB.index("<tr>"), EOS_ID])
        toks, boxes, _ = decode_structure(ids, np.ones(3),
                                          np.zeros((3, 8), np.float32))
        assert toks == ["<tr>"]

    def test_span_tokens_roundtrip_html(self):
        from oar_ocr_tpu.processors.table import wrap_table_html

        ids = _ids("<tbody>", "<tr>", "<td", ' colspan="3"', ">", "</td>",
                   "<td></td>", "</tr>", "</tbody>")
        toks, boxes, _ = decode_structure(
            np.concatenate([ids, [EOS_ID]]), np.ones(len(ids) + 1),
            np.random.rand(len(ids) + 1, 8).astype(np.float32))
        # both cell starters captured boxes ('<td' and '<td></td>')
        assert len(boxes) == 2
        html = wrap_table_html(toks, ["X", "Y"])
        assert '<td colspan="3">X</td>' in html and "<td>Y</td>" in html

    def test_cell_boxes_scale(self):
        from oar_ocr_tpu.models.recognition.slanet import TableStructure

        ts = TableStructure(tokens=["<td></td>"],
                            cell_boxes=np.array([[0, 0, 1, 0, 1, 1, 0, 1]],
                                                np.float32), score=0.9)
        assert ts.html_body == "<td></td>"


def test_formula_recognizer_tiny(rng):
    from oar_ocr_tpu.models.recognition.formula import (FormulaRecognizer,
                                                        PPFormulaNet)

    rec = FormulaRecognizer.__new__(FormulaRecognizer)
    # construct manually with a tiny net to keep CPU compile fast
    from oar_ocr_tpu.runtime.runtime import Runtime, init_params
    import jax

    rec.runtime = Runtime.default()
    rec.vocab = ["<s>", "<pad>", "</s>"] + list("xy^2+= ")
    rec.model = PPFormulaNet(vocab_size=len(rec.vocab), dim=32,
                             dec_layers=1, heads=4, max_len=5)
    rec.params = init_params(rec.model, (1, 64, 96, 3))
    rec._step = jax.jit(lambda p, x: rec.model.apply(p, x))

    crop = np.full((40, 80, 3), 255, np.uint8)
    crop[10:30, 10:70] = 30
    # patch operating shape for the tiny net
    FormulaRecognizer.INPUT_HW = (64, 96)
    try:
        out = rec.recognize([crop])
    finally:
        FormulaRecognizer.INPUT_HW = (192, 672)
    assert len(out) == 1
    assert isinstance(out[0].latex, str)
    assert 0.0 <= out[0].score <= 1.0
    assert rec.recognize([]) == []

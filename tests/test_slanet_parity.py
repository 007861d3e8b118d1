"""Golden parity for exact SLANet (PP-LCNet v1 + CSPPAN + SLAHead) against
an independent torch oracle at the official tensor names.

Same gate as test_golden_parity.py: strict ConversionMap conversion (every
expected name present) + unused_sources == [] (every official tensor
consumed), then numerical agreement of backbone/neck features and the full
autoregressive decode (structure logits, loc preds, and the emitted token
ids) up to each row's first EOS — past a row's EOS the flax head feeds EOS
while still writing identical steps until all rows finish, so the
comparable region is the decoded prefix (slanet.rs:27-35 dual outputs).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.models.recognition.slanet import EOS_ID
from oar_ocr_tpu.models.recognition.slanet_exact import (SLANetExact,
                                                         build_slanet_map)
from oar_ocr_tpu.runtime.runtime import init_params
from tools import torch_ref_slanet as tr

SCALE, HID, T, VOCAB, LOC = 0.5, 32, 8, 50, 8
HW = 72   # odd pyramid sizes (72→36→18→9→5→3) exercise the exact-size
          # nearest upsample the 488-px deploy shape needs


@pytest.fixture(scope="module")
def models():
    t = tr.SLANet(vocab_size=VOCAB, scale=SCALE, neck_channels=48,
                  hidden_size=HID, max_text_length=T, loc_reg_num=LOC)
    tr.seed_all(t, seed=5)
    f = SLANetExact(vocab_size=VOCAB, scale=SCALE, neck_channels=48,
                    hidden_size=HID, max_text_length=T, loc_reg_num=LOC)
    params = init_params(f, (1, HW, HW, 3))
    cm = build_slanet_map(params, name="slanet-golden")
    fixture = tr.export(t)
    tree = cm.convert(fixture, strict=True)
    assert cm.unused_sources(fixture) == []
    return t, f, tree


def _x(seed=0, b=2):
    return np.random.default_rng(seed).normal(
        size=(b, HW, HW, 3)).astype(np.float32) * 0.5


class TestSLANetParity:
    def test_backbone_parity(self, models):
        t, _, tree = models
        x = _x(1)
        with torch.no_grad():
            ref = t.backbone(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        from oar_ocr_tpu.models.recognition.slanet_exact import PPLCNetTable

        bb = PPLCNetTable(SCALE)
        sub = {c: v["backbone"] for c, v in tree.items()}
        outs = bb.apply(sub, jnp.asarray(x))
        assert len(outs) == 4
        for lvl, (ours, theirs) in enumerate(zip(outs, ref)):
            np.testing.assert_allclose(
                np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
                atol=2e-4, rtol=1e-3, err_msg=f"stage {lvl}")

    def test_neck_parity(self, models):
        t, _, tree = models
        x = _x(2)
        with torch.no_grad():
            ref = t.neck(t.backbone(torch.from_numpy(
                x.transpose(0, 3, 1, 2))))[-1]
        from oar_ocr_tpu.models.recognition.slanet_exact import (CSPPAN,
                                                                 PPLCNetTable)
        import flax.linen as nn

        class Trunk(nn.Module):
            @nn.compact
            def __call__(self, x):
                return CSPPAN(48, name="neck")(
                    PPLCNetTable(SCALE, name="backbone")(x))[-1]

        out = Trunk().apply(tree, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy().transpose(0, 2, 3, 1),
            atol=5e-4, rtol=1e-3)

    def test_decode_parity(self, models):
        t, f, tree = models
        x = _x(3)
        with torch.no_grad():
            ref_s, ref_l = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ref_s, ref_l = ref_s.numpy(), ref_l.numpy()
        ours_s, ours_l = f.apply(tree, jnp.asarray(x))
        ours_s, ours_l = np.asarray(ours_s), np.asarray(ours_l)
        ref_ids = ref_s.argmax(-1)
        for b in range(x.shape[0]):
            eos = np.where(ref_ids[b] == EOS_ID)[0]
            end = int(eos[0]) + 1 if eos.size else T + 1
            np.testing.assert_array_equal(
                ours_s[b, :end].argmax(-1), ref_ids[b, :end],
                err_msg=f"row {b} token ids")
            np.testing.assert_allclose(ours_s[b, :end], ref_s[b, :end],
                                       atol=2e-4, rtol=1e-3)
            np.testing.assert_allclose(ours_l[b, :end], ref_l[b, :end],
                                       atol=2e-4, rtol=1e-3)


def test_official_names_shape():
    """Spot-check emitted names against the documented checkpoint paths."""
    f = SLANetExact(vocab_size=VOCAB, scale=SCALE, neck_channels=48,
                    hidden_size=HID, max_text_length=T, loc_reg_num=LOC)
    params = init_params(f, (1, HW, HW, 3))
    cm = build_slanet_map(params)
    names = {s for _, s, _ in cm.rules}
    for expected in [
        "backbone.conv1.conv.weight",
        "backbone.blocks6.0.se.conv1.bias",
        "backbone.blocks5.3.dw_conv.bn._variance",
        "neck.conv_t.convs.0.conv.weight",
        "neck.top_down_blocks.0.blocks.0.conv2.dwconv.weight",
        "neck.downsamples.1.pwconv.weight",
        "neck.bottom_up_blocks.2.final_conv.bn.weight",
        "head.structure_attention_cell.i2h.weight",
        "head.structure_attention_cell.rnn.weight_hh",
        "head.structure_generator.1.bias",
        "head.loc_generator.1.weight",
    ]:
        assert expected in names, expected


def test_exact_driver_smoke():
    from oar_ocr_tpu.models.recognition.slanet_exact import SLANetExactModel

    m = SLANetExactModel(max_text_length=6)
    crop = np.random.default_rng(0).integers(
        0, 255, (60, 90, 3), dtype=np.uint8)
    out = m.recognize_images([crop])
    assert len(out) == 1
    assert out[0].cell_boxes.shape[1:] == (8,) or out[0].cell_boxes.size == 0
    assert m.recognize_images([]) == []


def test_table_analyzer_accepts_exact(monkeypatch):
    """The exact model is a drop-in ``structure`` for TableAnalyzer
    (device recognize() keep-ratio path)."""
    import jax.numpy as jnp

    from oar_ocr_tpu.models.recognition.slanet_exact import SLANetExactModel
    from oar_ocr_tpu.pipelines.table_analyzer import TableAnalyzer

    m = SLANetExactModel(max_text_length=4)
    page = np.random.default_rng(1).integers(
        0, 255, (1, 120, 160, 3), dtype=np.uint8)
    out = m.recognize(jnp.asarray(page), [(0, (10, 10, 150, 110)),
                                          (0, (20, 30, 90, 80))])
    assert len(out) == 2
    # the keyword routes construction without building the heavy default
    built = {}
    monkeypatch.setattr(
        "oar_ocr_tpu.models.recognition.slanet_exact.SLANetExactModel",
        lambda runtime=None: built.setdefault("exact", m))
    ta = TableAnalyzer(structure_model_type="slanet-exact",
                       use_cell_detection=False)
    assert ta.structure is m

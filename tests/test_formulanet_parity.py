"""Golden parity for the exact PP-FormulaNet-S (VERDICT r2 item 4).

Two independent oracles: the backbone against the torch PPHGNetV2 mirror
already validated by RT-DETR parity (tools/torch_ref_rtdetr.py), and the
decoder against the OFFICIAL transformers MBartForCausalLM with cross
attention — the same oracle UniMERNet's MBart passed against. The
enc_to_dec_proj bridge is exercised end to end.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
import jax  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.models.recognition.pp_formulanet_exact import (
    PPFormulaNetConfig, PPFormulaNetModule)
from oar_ocr_tpu.runtime.ppocr_maps import _hf_dense, ppocr_name
from oar_ocr_tpu.runtime.weights import ConversionMap, flatten_params
from tools import torch_ref_rtdetr as tr
from tools.torch_ref import paddle_state_dict

CFG = PPFormulaNetConfig().tiny()


def _torch_parts():
    from transformers import MBartConfig
    from transformers.models.mbart.modeling_mbart import MBartForCausalLM

    backbone = tr.PPHGNetV2(arch=CFG.hg_arch, return_idx=(3,))
    proj = torch.nn.Linear(256, CFG.d_model)   # T-arch stage4 = 256ch
    dec = MBartForCausalLM(MBartConfig(
        vocab_size=CFG.vocab_size, d_model=CFG.d_model,
        decoder_layers=CFG.dec_layers,
        decoder_attention_heads=CFG.dec_heads,
        decoder_ffn_dim=CFG.dec_ffn, is_decoder=True,
        add_cross_attention=True, scale_embedding=True,
        max_position_embeddings=CFG.max_positions, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu"))
    g = torch.Generator().manual_seed(3)
    for m in (backbone, proj, dec):
        for p in m.parameters():
            with torch.no_grad():
                p.copy_(torch.randn(p.shape, generator=g) * 0.04)
        m.eval()
    for name, b in backbone.named_buffers():
        if name.endswith("running_var"):
            with torch.no_grad():
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.75)
    return backbone, proj, dec


@pytest.fixture(scope="module")
def models():
    backbone, proj, dec = _torch_parts()
    f = PPFormulaNetModule(CFG)
    params = f.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, *CFG.image_hw, 3), jnp.float32),
                    jnp.zeros((1, 2), jnp.int32))
    fixture = {}
    for k, v in paddle_state_dict(backbone).items():
        fixture["backbone." + k] = v
    fixture["head.enc_to_dec_proj.weight"] = \
        proj.weight.detach().numpy().T          # paddle (in, out)
    fixture["head.enc_to_dec_proj.bias"] = proj.bias.detach().numpy()
    for k, v in dec.state_dict().items():
        fixture["head.decoder." + k] = v.numpy()

    cm = ConversionMap("pp-formulanet")
    for key, value in flatten_params(params).items():
        source = ppocr_name(key)
        transform = None
        if "head.decoder" in key:
            if key.endswith("/kernel") and np.ndim(value) == 2:
                transform = _hf_dense        # HF Linear is (out, in)
        elif key.endswith("/kernel") and np.ndim(value) == 4:
            from oar_ocr_tpu.runtime.ppocr_maps import _conv_oihw_to_hwio
            transform = _conv_oihw_to_hwio
        cm.map(key, source, transform)
    tree = cm.convert(fixture, strict=True)
    unused = [u for u in cm.unused_sources(fixture)
              if u != "head.decoder.lm_head.weight"]   # tied embedding
    assert unused == [], unused
    return backbone, proj, dec, f, tree


def test_encoder_parity(models):
    backbone, proj, _, f, tree = models
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, *CFG.image_hw, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        (feat,) = backbone(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        b, c, h, w = feat.shape
        ref = proj(feat.permute(0, 2, 3, 1).reshape(b, h * w, c)).numpy()
    ours = f.apply(tree, jnp.asarray(x), method=PPFormulaNetModule.encode)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3, rtol=1e-2)


def test_end_to_end_parity(models):
    backbone, proj, dec, f, tree = models
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, *CFG.image_hw, 3)).astype(np.float32) * 0.5
    ids = rng.integers(0, CFG.vocab_size, (1, 5)).astype(np.int64)
    with torch.no_grad():
        (feat,) = backbone(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        b, c, h, w = feat.shape
        enc = proj(feat.permute(0, 2, 3, 1).reshape(b, h * w, c))
        ref = dec(input_ids=torch.from_numpy(ids),
                  encoder_hidden_states=enc).logits.numpy()
    ours = f.apply(tree, jnp.asarray(x), jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-3, rtol=1e-2)


def test_recognizer_driver_smoke():
    from oar_ocr_tpu.models.recognition.pp_formulanet_exact import (
        PPFormulaNetRecognizer)

    rec = PPFormulaNetRecognizer(cfg=CFG, seed=2)
    crop = np.full((40, 90, 3), 255, np.uint8)
    crop[12:28, 10:70] = 30
    out = rec.recognize([crop], max_new_tokens=7)
    assert len(out) == 1 and isinstance(out[0], str)
    # parallel-step decode emits at most parallel_step tokens per forward
    assert len(out[0].split()) <= 7


# ---------------------- PP-FormulaNet-L (Vary tower) ----------------------

LCFG = PPFormulaNetConfig().tiny_large()


@pytest.fixture(scope="module")
def l_models():
    """L-shape: full Vary tower (net_2+net_3+mm_projector_vary) + MBart,
    encoder width == decoder width → no enc_to_dec_proj (byte-arithmetic
    pinning in pp_formulanet_exact.VaryConfig)."""
    from transformers import MBartConfig
    from transformers.models.mbart.modeling_mbart import MBartForCausalLM

    from tools import torch_ref_slanext as ts

    v = LCFG.vary
    backbone = ts.VaryVITB(projector=True, img_size=LCFG.image_hw[0],
                           patch=v.patch, dim=v.dim, depth=v.depth,
                           heads=v.heads, window=v.window,
                           global_idx=v.global_idx, out_chans=v.out_chans,
                           net2_out=v.net2_out, net3_out=v.net3_out)
    dec = MBartForCausalLM(MBartConfig(
        vocab_size=LCFG.vocab_size, d_model=LCFG.d_model,
        decoder_layers=LCFG.dec_layers,
        decoder_attention_heads=LCFG.dec_heads,
        decoder_ffn_dim=LCFG.dec_ffn, is_decoder=True,
        add_cross_attention=True, scale_embedding=True,
        max_position_embeddings=LCFG.max_positions, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu"))
    g = torch.Generator().manual_seed(11)
    for m in (backbone, dec):
        for p in m.parameters():
            with torch.no_grad():
                p.copy_(torch.randn(p.shape, generator=g) * 0.04)
        m.eval()

    f = PPFormulaNetModule(LCFG)
    params = f.init(jax.random.PRNGKey(1),
                    jnp.zeros((1, *LCFG.image_hw, 3), jnp.float32),
                    jnp.zeros((1, 2), jnp.int32))
    fixture = {}
    for k, v_ in paddle_state_dict(backbone).items():
        fixture["backbone." + k] = v_
    for k, v_ in dec.state_dict().items():
        fixture["head.decoder." + k] = v_.numpy()

    from oar_ocr_tpu.models.recognition.pp_formulanet_exact import \
        build_formulanet_map

    cm = build_formulanet_map(params, name="pp-formulanet-l")
    tree = cm.convert(fixture, strict=True)
    unused = [u for u in cm.unused_sources(fixture)
              if u != "head.decoder.lm_head.weight"]   # tied embedding
    assert unused == [], unused
    return backbone, dec, f, tree


def test_l_encoder_parity(l_models):
    backbone, _, f, tree = l_models
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, *LCFG.image_hw, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = backbone(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = f.apply(tree, jnp.asarray(x), method=PPFormulaNetModule.encode)
    assert ours.shape == ref.shape     # (B, N, d_model), no proj bridge
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3, rtol=1e-2)


def test_l_end_to_end_parity(l_models):
    backbone, dec, f, tree = l_models
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, *LCFG.image_hw, 3)).astype(np.float32) * 0.5
    ids = rng.integers(0, LCFG.vocab_size, (1, 4)).astype(np.int64)
    with torch.no_grad():
        enc = backbone(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ref = dec(input_ids=torch.from_numpy(ids),
                  encoder_hidden_states=enc).logits.numpy()
    ours = f.apply(tree, jnp.asarray(x), jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-3, rtol=1e-2)


def test_l_real_config_shapes():
    """The real L config wires the full tower at the pinned dims."""
    cfg = PPFormulaNetConfig().large()
    assert cfg.vary.net3_out == 1024 and cfg.encoder_hidden == 1024
    assert cfg.d_model == 1024 and cfg.dec_layers == 2
    assert cfg.parallel_step == 1 and cfg.image_hw == (768, 768)

"""Golden parity for the exact HunyuanOCR architecture (VERDICT r1 #3).

Oracle: tools/torch_ref_hunyuan.py — independent torch statement using
torch's own F.interpolate (position table), F.scaled_dot_product_attention
and the literal doubled-section XDRoPE mix (select_rope_sections,
attention.rs:906). Name parity both ways + numeric parity at float32
tolerance on the tiny config (wiring under test; dims are config data).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
import jax  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.vl.hunyuan import (HunyuanOCRConfig, HunyuanOCRModule,
                                    interpolate_positions)
from oar_ocr_tpu.runtime.ppocr_maps import build_hunyuan_map
from tools import torch_ref_hunyuan as tr
from tools.torch_ref_vl import hf_state_dict, seed_all

CFG = HunyuanOCRConfig().tiny()


@pytest.fixture(scope="module")
def models():
    t = tr.HunyuanOCRTorch(
        vocab=CFG.vocab_size, hidden=CFG.hidden, layers=CFG.layers,
        heads=CFG.heads, kv_heads=CFG.kv_heads, head_dim=CFG.head_dim,
        ffn=CFG.ffn, sections=CFG.xdrope_section,
        v_dim=CFG.v_dim, v_heads=CFG.v_heads, v_ffn=CFG.v_ffn,
        v_layers=CFG.v_layers, v_patch=CFG.v_patch, v_merge=CFG.v_merge,
        v_grid=CFG.v_grid)
    seed_all(t, seed=5)
    f = HunyuanOCRModule(CFG)
    rng = jax.random.PRNGKey(0)
    p2 = CFG.v_patch ** 2 * 3
    patches = jnp.zeros((1, 4, p2), jnp.float32)
    pos = jnp.zeros((4, CFG.v_dim), jnp.float32)
    ids = jnp.zeros((1, 4), jnp.int32)
    pids = jnp.zeros((4, 1, 4), jnp.int32)
    params = f.init(rng, patches, pos, 2, 2, ids, pids,
                    method=HunyuanOCRModule.init_all)
    cm = build_hunyuan_map(params)
    fixture = hf_state_dict(t)
    tree = cm.convert(fixture, strict=True)
    assert cm.unused_sources(fixture) == []
    return t, f, tree


def test_position_interpolation(models):
    t, _, tree = models
    table = np.asarray(
        tree["params"]["vit.embeddings.position_embedding"]["embedding"])
    ours = interpolate_positions(table[1:], CFG.v_grid, 5, 7)
    with torch.no_grad():
        ref = t.vit.interpolate_pos(5, 7).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_vision_parity(models):
    t, f, tree = models
    rh = rw = CFG.v_patch * 6
    x = np.random.default_rng(2).normal(size=(1, 3, rh, rw)
                                        ).astype(np.float32)
    with torch.no_grad():
        ref = t.vit(torch.from_numpy(x)).numpy()
    # host side: flatten patches HWC-order + interpolate positions
    g = 6
    p = CFG.v_patch
    img = x[0].transpose(1, 2, 0)                      # HWC
    patches = img.reshape(g, p, g, p, 3).transpose(0, 2, 1, 3, 4
                                                   ).reshape(1, g * g, -1)
    table = np.asarray(
        tree["params"]["vit.embeddings.position_embedding"]["embedding"])
    pos = interpolate_positions(table[1:], CFG.v_grid, g, g)
    out = f.apply(tree, jnp.asarray(patches), jnp.asarray(pos), g, g,
                  method=HunyuanOCRModule.encode_image)
    assert out.shape == ref.shape          # (1 + 3*(3+1) + 1, hidden)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_decoder_parity(models):
    t, f, tree = models
    rng = np.random.default_rng(3)
    ids = rng.integers(0, CFG.vocab_size, (2, 9)).astype(np.int32)
    pids = np.broadcast_to(np.arange(9, dtype=np.int32)[None, None],
                           (4, 2, 9)).copy()
    pids[1] += 1                                    # distinct per-axis ids
    pids[2] += 2
    pids[3] = 0
    with torch.no_grad():
        emb = t.model.embed_tokens(torch.from_numpy(ids).long())
        ref = t.model(emb, torch.from_numpy(pids).long()).numpy()
    from oar_ocr_tpu.vl.kv_cache import KVCache
    from oar_ocr_tpu.vl.attention import create_causal_mask

    embeds = f.apply(tree, jnp.asarray(ids), method=HunyuanOCRModule.embed)
    cache = KVCache.create(CFG.layers, 2, CFG.kv_heads, 9, CFG.head_dim,
                           dtype=jnp.float32)
    mask = jnp.broadcast_to(create_causal_mask(9), (2, 1, 9, 9))
    logits, hidden, _ = f.apply(tree, embeds, jnp.asarray(pids), cache,
                                mask, method=HunyuanOCRModule.prefill)
    full = f.apply(tree, hidden, method=HunyuanOCRModule.lm_logits)
    np.testing.assert_allclose(np.asarray(full), ref, atol=5e-4, rtol=1e-3)


def test_official_names(models):
    _, _, tree = models
    from oar_ocr_tpu.runtime.weights import flatten_params
    from oar_ocr_tpu.runtime.ppocr_maps import hf_vl_name

    names = {hf_vl_name(k) for k in flatten_params(tree)}
    for expected in [
        "vit.embeddings.patch_embedding.weight",
        "vit.embeddings.position_embedding.weight",
        "vit.layers.0.self_attn.q_proj.weight",
        "vit.layers.0.mlp.dense_h_to_4h.weight",
        "vit.perceive.before_rms.weight",
        "vit.perceive.proj.0.weight",
        "vit.perceive.image_newline",
        "model.embed_tokens.weight",
        "model.layers.0.self_attn.query_layernorm.weight",
        "model.layers.1.mlp.gate_proj.weight",
        "model.norm.weight",
    ]:
        assert expected in names, expected


def test_build_position_ids_spatial_run():
    # model.rs:1476-1527: run starts one AFTER the first image token
    pids = np.asarray(__import__(
        "oar_ocr_tpu.vl.hunyuan", fromlist=["build_position_ids"]
    ).build_position_ids(12, 2, hm=2, wm=2))
    assert pids.shape == (4, 12)
    np.testing.assert_array_equal(pids[0], np.arange(12))
    # begin marker (index 2) keeps arange on all axes
    assert pids[1, 2] == 2 and pids[2, 2] == 2 and pids[3, 2] == 2
    # spatial run: 6 tokens at 3..8, w cycles 0..2, h rows, t zero
    np.testing.assert_array_equal(pids[1, 3:9], [0, 1, 2, 0, 1, 2])
    np.testing.assert_array_equal(pids[2, 3:9], [0, 0, 0, 1, 1, 1])
    np.testing.assert_array_equal(pids[3, 3:9], [0, 0, 0, 0, 0, 0])
    # trailing text resumes arange
    np.testing.assert_array_equal(pids[1, 9:], [9, 10, 11])


def test_generate_driver_smoke():
    from oar_ocr_tpu.vl.hunyuan import HunyuanOCRModel

    m = HunyuanOCRModel(cfg=CFG, seed=3)
    img = np.random.default_rng(0).integers(0, 255, (24, 40, 3),
                                            dtype=np.uint8)
    out = m.generate([img], max_new_tokens=6)
    assert len(out) == 1 and isinstance(out[0], str)
    # deterministic across calls (greedy, fixed weights)
    assert out == m.generate([img], max_new_tokens=6)


def test_speculative_greedy_exactness():
    """DFlash speculation on the EXACT stack emits the same token stream
    as plain greedy decode (vl/hunyuan.HunyuanOCRSpeculative)."""
    from oar_ocr_tpu.vl.dflash import DFlashConfig
    from oar_ocr_tpu.vl.hunyuan import (HunyuanOCRModel,
                                        HunyuanOCRSpeculative)

    dcfg = DFlashConfig().tiny(vocab_size=CFG.vocab_size,
                               hidden=CFG.hidden)
    img = np.random.default_rng(1).integers(0, 255, (24, 40, 3),
                                            dtype=np.uint8)
    for seed in (3, 9):
        spec = HunyuanOCRSpeculative(cfg=CFG, dflash_cfg=dcfg, seed=seed)
        plain = HunyuanOCRModel(cfg=CFG, seed=seed)
        s_out = spec.generate_speculative([img], max_new_tokens=12)
        p_out = plain.generate([img], max_new_tokens=12)
        assert s_out == p_out, (seed, s_out, p_out)

"""Golden parity for the unified per-family LLM decoders (VERDICT r1 #3
remainder: MinerU Qwen2-VL, SDAR/Qwen3 (MinerU-Diffusion + MonkeyOCRv2 +
HPD), GLM-OCR, OvisOCR2 hybrid).

Each variant runs at tiny dims with its REAL structural flags; the torch
oracle (tools/torch_ref_llm.py) implements interleaved partial rotary,
additive qk norms, fused gate_up, sandwich norms, and the GatedDeltaNet
recurrence independently (per-step loop + F.conv1d)."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
import jax  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.vl.kv_cache import KVCache
from oar_ocr_tpu.vl.llm_decoders import (GLM_TEXT, MINERU_TEXT, OVIS_TEXT,
                                         SDAR_TEXT, UnifiedDecoder,
                                         UnifiedLMConfig)
from oar_ocr_tpu.runtime.ppocr_maps import hf_vl_name
from oar_ocr_tpu.runtime.weights import ConversionMap, flatten_params
from tools import torch_ref_llm as tr
from tools.torch_ref_vl import hf_state_dict, seed_all

TINY = dict(vocab_size=256, hidden=64, layers=2, heads=4, kv_heads=2,
            head_dim=16, ffn=96)

VARIANTS = {
    "mineru": dataclasses.replace(
        MINERU_TEXT, **TINY, mrope_sections=(2, 3, 3)),
    "sdar": dataclasses.replace(SDAR_TEXT, **TINY),
    "glm": dataclasses.replace(GLM_TEXT, **TINY),
    # 4 layers so the hybrid pattern exercises BOTH mixer kinds
    "ovis": dataclasses.replace(
        OVIS_TEXT, **{**TINY, "layers": 4}, linear_v_heads=4,
        linear_k_heads=2, linear_head_dim=8, conv_kernel=4),
}


def _flags(cfg: UnifiedLMConfig) -> dict:
    return dict(
        vocab_size=cfg.vocab_size, hidden=cfg.hidden, layers=cfg.layers,
        heads=cfg.heads, kv_heads=cfg.kv_heads, head_dim=cfg.head_dim,
        ffn=cfg.ffn, rms_eps=cfg.rms_eps, rope_theta=cfg.rope_theta,
        qkv_bias=cfg.qkv_bias, qk_norm=cfg.qk_norm,
        partial_rotary=cfg.partial_rotary,
        interleaved_rotary=cfg.interleaved_rotary,
        fused_gate_up=cfg.fused_gate_up,
        sandwich_norms=cfg.sandwich_norms, rope_kind=cfg.rope_kind,
        mrope_sections=cfg.mrope_sections, layer_types=cfg.layer_types,
        linear_v_heads=cfg.linear_v_heads,
        linear_k_heads=cfg.linear_k_heads,
        linear_head_dim=cfg.linear_head_dim, conv_kernel=cfg.conv_kernel)


def _convert(params, torch_model):
    cm = ConversionMap("llm")
    for key, value in flatten_params(params).items():
        source = hf_vl_name(key)
        transform = None
        if key.endswith("/kernel") and np.ndim(value) == 2:
            transform = lambda w: np.transpose(w, (1, 0))
        cm.map(key, source, transform)
    fixture = {k.replace("conv1d_weight", "conv1d.weight"): v
               for k, v in hf_state_dict(torch_model).items()}
    tree = cm.convert(fixture, strict=True)
    assert cm.unused_sources(fixture) == []
    return tree


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_decoder_parity(name):
    cfg = VARIANTS[name]
    t = tr.UnifiedDecoderTorch(**_flags(cfg))
    seed_all(t, seed=21)
    f = UnifiedDecoder(cfg)
    rng = np.random.default_rng(7)
    b, s = 2, 7
    ids = rng.integers(0, cfg.vocab_size, (b, s)).astype(np.int32)
    if cfg.rope_kind == "mrope":
        pids = np.broadcast_to(np.arange(s, dtype=np.int32)[None, None],
                               (3, b, s)).copy()
        pids[1] += 2
        pids[2] += 5
    else:
        pids = np.broadcast_to(np.arange(s, dtype=np.int32)[None], (b, s))
    cache = KVCache.create(cfg.layers, b, cfg.kv_heads, s, cfg.head_dim,
                           dtype=jnp.float32)
    from oar_ocr_tpu.vl.attention import create_causal_mask

    mask = jnp.broadcast_to(create_causal_mask(s), (b, 1, s, s))
    params = f.init(jax.random.PRNGKey(0),
                    jnp.zeros((b, s, cfg.hidden), jnp.float32),
                    jnp.asarray(pids), cache, jnp.int32(0), mask)
    tree = _convert(params, t)

    x = rng.normal(size=(b, s, cfg.hidden)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = t(torch.from_numpy(x), torch.from_numpy(np.asarray(pids))
                ).numpy()
    out, _, _, _ = f.apply(tree, jnp.asarray(x), jnp.asarray(pids), cache,
                           jnp.int32(0), mask)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)


def test_official_names_per_variant():
    cfg = VARIANTS["ovis"]
    f = UnifiedDecoder(cfg)
    cache = KVCache.create(cfg.layers, 1, cfg.kv_heads, 4, cfg.head_dim,
                           dtype=jnp.float32)
    from oar_ocr_tpu.vl.attention import create_causal_mask

    mask = jnp.broadcast_to(create_causal_mask(4), (1, 1, 4, 4))
    pids = jnp.zeros((1, 4), jnp.int32)
    params = f.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 4, cfg.hidden), jnp.float32), pids,
                    cache, jnp.int32(0), mask)
    names = {hf_vl_name(k) for k in flatten_params(params)}
    for expected in [
        "embed_tokens.weight",
        "layers.0.linear_attn.in_proj_qkv.weight",
        "layers.0.linear_attn.conv1d.weight",
        "layers.0.linear_attn.A_log",
        "layers.0.linear_attn.dt_bias",
        "layers.0.linear_attn.norm.weight",
        "layers.3.self_attn.q_norm.weight",
        "layers.3.self_attn.q_proj.weight",
        "norm.weight",
    ]:
        assert expected in names, sorted(n for n in names if "0" in n)[:10]


def test_glm_names_sandwich():
    cfg = VARIANTS["glm"]
    f = UnifiedDecoder(cfg)
    cache = KVCache.create(cfg.layers, 1, cfg.kv_heads, 4, cfg.head_dim,
                           dtype=jnp.float32)
    from oar_ocr_tpu.vl.attention import create_causal_mask

    mask = jnp.broadcast_to(create_causal_mask(4), (1, 1, 4, 4))
    params = f.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 4, cfg.hidden), jnp.float32),
                    jnp.zeros((1, 4), jnp.int32), cache, jnp.int32(0),
                    mask)
    names = {hf_vl_name(k) for k in flatten_params(params)}
    assert "layers.0.post_self_attn_layernorm.weight" in names
    assert "layers.0.post_mlp_layernorm.weight" in names
    assert "layers.0.mlp.gate_up_proj.weight" in names


def test_glm_mtp_head():
    """GLM MTP draft: checkpoint names + a draft→verify exactness round
    (the emitted tokens come from the TARGET's argmaxes regardless of
    draft quality — vl/speculative.verify_draft)."""
    from oar_ocr_tpu.vl.llm_decoders import GlmMtpHead
    from oar_ocr_tpu.vl.speculative import verify_draft

    cfg = VARIANTS["glm"]
    head = GlmMtpHead(cfg)
    b, k = 1, 3
    cache = KVCache.create(1, b, cfg.kv_heads, 8, cfg.head_dim,
                           dtype=jnp.float32)
    ids = jnp.zeros((b, k), jnp.int32)
    prev = jnp.zeros((b, k, cfg.hidden), jnp.float32)
    pids = jnp.arange(k, dtype=jnp.int32)[None]
    mask = jnp.ones((b, 1, k, 8), bool)
    params = head.init(jax.random.PRNGKey(3), ids, prev, pids, cache,
                       jnp.int32(0), mask)
    names = {hf_vl_name(kk) for kk in flatten_params(params)}
    for expected in ["embed_tokens.weight", "enorm.weight", "hnorm.weight",
                     "eh_proj.weight", "input_layernorm.weight",
                     "self_attn.q_proj.weight", "mlp.gate_up_proj.weight",
                     "shared_head.norm.weight", "shared_head.head.weight",
                     "post_self_attn_layernorm.weight"]:
        assert expected in names, expected
    logits, hidden, _ = head.apply(params, ids, prev, pids, cache,
                                   jnp.int32(0), mask)
    assert logits.shape == (b, k, cfg.vocab_size)
    assert hidden.shape == (b, k, cfg.hidden)
    # verification exactness: whatever the draft proposes, the emitted
    # prefix equals the target's own argmaxes
    drafts = jnp.argmax(logits, -1).astype(jnp.int32)
    target_logits = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, k + 1, cfg.vocab_size))
        .astype(np.float32))
    res = verify_draft(drafts, target_logits)
    target_argmax = np.asarray(jnp.argmax(target_logits, -1))
    n = int(res.accepted[0])
    emitted = np.asarray(res.next_tokens)[0, :n + 1]
    np.testing.assert_array_equal(emitted, target_argmax[0, :n + 1])

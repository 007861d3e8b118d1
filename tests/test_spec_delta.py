"""Speculative decoding × gated-delta layers (the combination the
reference avoids — vl/speculative.py module docstring).

Covers the rollback machinery end to end:
- per-step states from the sequential gated delta rule equal prefix
  recomputation (the resume-from-accepted-position invariant);
- the n-gram prompt-lookup drafter proposes the continuation of the most
  recent earlier occurrence (and degrades safely with no match);
- decode_block_spec per-step states equal sequential decode_step states
  on the tiny hybrid Ovis stack (delta + conv + KV all roll back);
- ExactVLM.generate_speculative is greedy-exact on the hybrid stack
  (output == generate token for token, for any draft quality).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.vl.gated_delta import gated_delta_rule  # noqa: E402
from oar_ocr_tpu.vl.speculative import ngram_draft  # noqa: E402


def test_gated_delta_per_step_states_match_prefix():
    rng = np.random.default_rng(0)
    b, h, t, dk, dv = 2, 3, 7, 4, 5
    q = jnp.asarray(rng.normal(size=(b, h, t, dk)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, dv)), jnp.float32)
    a = jnp.asarray(rng.uniform(0.5, 1.0, size=(b, h, t)), jnp.float32)
    bt = jnp.asarray(rng.uniform(0.0, 1.0, size=(b, h, t)), jnp.float32)
    s0 = jnp.asarray(rng.normal(size=(b, h, dk, dv)), jnp.float32)

    out, states = gated_delta_rule(q, k, v, a, bt, initial_state=s0,
                                   return_all_states=True)
    assert states.shape == (b, t, h, dk, dv)
    for j in (0, 3, t - 1):
        out_j, s_j = gated_delta_rule(
            q[:, :, :j + 1], k[:, :, :j + 1], v[:, :, :j + 1],
            a[:, :, :j + 1], bt[:, :, :j + 1], initial_state=s0,
            return_state=True)
        np.testing.assert_allclose(np.asarray(states[:, j]),
                                   np.asarray(s_j), rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(out[:, :, :j + 1]),
                                   np.asarray(out_j), rtol=0, atol=0)


def test_ngram_draft_proposes_continuation():
    # history: 5 6 7 8 5 6 — trailing bigram (5,6) occurred at i=0, its
    # continuation is 7 8 <next committed = 7? no: 7, 8, 5>
    hist = np.full((1, 16), -1, np.int32)
    seq = [5, 6, 7, 8, 5, 6]
    hist[0, :len(seq)] = seq
    drafts = ngram_draft(jnp.asarray(hist),
                         jnp.asarray([len(seq)], np.int32), k=3, n=2)
    assert drafts.shape == (1, 3)
    assert drafts[0, 0] == 7 and drafts[0, 1] == 8 and drafts[0, 2] == 5

    # most RECENT earlier occurrence wins: 1 2 9 1 2 8 1 2
    seq2 = [1, 2, 9, 1, 2, 8, 1, 2]
    hist2 = np.full((1, 16), -1, np.int32)
    hist2[0, :len(seq2)] = seq2
    d2 = ngram_draft(jnp.asarray(hist2),
                     jnp.asarray([len(seq2)], np.int32), k=2, n=2)
    assert d2[0, 0] == 8  # continuation after the i=3 occurrence

    # no match → repeat the last token (safe filler; rejected by verify)
    seq3 = [3, 4, 5, 6]
    hist3 = np.full((1, 16), -1, np.int32)
    hist3[0, :len(seq3)] = seq3
    d3 = ngram_draft(jnp.asarray(hist3),
                     jnp.asarray([len(seq3)], np.int32), k=3, n=2)
    assert np.all(np.asarray(d3) == 6)


def _tiny_ovis():
    from oar_ocr_tpu.vl.exact_models import ovis_exact

    return ovis_exact(tiny=True, seed=7)


def test_decode_block_spec_states_match_sequential():
    """Per-step (dstate, conv_state) from one K+1 verify block equal the
    states from feeding the same tokens one decode_step at a time."""
    from oar_ocr_tpu.vl.exact_models import ExactVLMModule
    from oar_ocr_tpu.vl.kv_cache import KVCache

    m = _tiny_ovis()
    c = m.spec.text_cfg
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, c.vocab_size, size=(1, 4)),
                       jnp.int32)
    cap = 32

    def fresh():
        cache = KVCache.create(c.layers, 1, c.kv_heads, cap, c.head_dim,
                               dtype=jnp.float32)
        ds, cv = m._empty_states(m.params, 1)
        return cache, ds, cv

    # block pass with per-step states
    cache_b, ds0, cv0 = fresh()
    pids = jnp.arange(4, dtype=jnp.int32)[None]
    logits_b, cache_b, step_ds, step_cs = m.module.apply(
        m.params, toks, pids, cache_b, jnp.int32(0), ds0, cv0,
        method=ExactVLMModule.decode_block_spec)
    # per-step states cover the DELTA layers only (full-attention rows
    # pass through unchanged and are not duplicated over T)
    delta = list(c.delta_layers())
    assert step_ds.shape[0] == len(delta) and step_ds.shape[2] == 4
    assert step_cs.shape[0] == len(delta) and step_cs.shape[2] == 4

    # sequential decode_step over the same tokens
    cache_s, ds, cv = fresh()
    for j in range(4):
        pj = jnp.asarray([[j]], jnp.int32)
        logits_j, cache_s, ds, cv = m.module.apply(
            m.params, toks[:, j], pj, cache_s, jnp.int32(j), ds, cv,
            method=ExactVLMModule.decode_step)
        np.testing.assert_allclose(
            np.asarray(step_ds[:, :, j]), np.asarray(ds)[delta],
            rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(step_cs[:, :, j]), np.asarray(cv)[delta],
            rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(logits_b[:, j]),
                                   np.asarray(logits_j),
                                   rtol=0, atol=1e-4)


def test_hybrid_speculative_greedy_exact():
    """generate_speculative == generate on the hybrid delta stack — the
    headline: delta layers now ride speculation (reference: Ovis decodes
    strictly greedily, ovisocr2/model.rs)."""
    img = np.random.default_rng(2).integers(0, 255, (24, 40, 3),
                                            dtype=np.uint8)
    m = _tiny_ovis()
    plain = m.generate([img], max_new_tokens=12)
    spec = m.generate_speculative([img], max_new_tokens=12, draft_k=4)
    assert spec == plain, (spec, plain)


def test_mrope_speculative_greedy_exact():
    """Same exactness on an mrope (Qwen2-VL positions) pure-attention
    stack — covers the 3-axis position arithmetic of the verify block."""
    from oar_ocr_tpu.vl.exact_models import mineru_exact

    img = np.random.default_rng(3).integers(0, 255, (24, 40, 3),
                                            dtype=np.uint8)
    m = mineru_exact(tiny=True, seed=11)
    plain = m.generate([img], max_new_tokens=10)
    spec = m.generate_speculative([img], max_new_tokens=10, draft_k=3)
    assert spec == plain, (spec, plain)

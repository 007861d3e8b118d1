"""Pallas flash attention vs the fused-XLA reference (interpret mode on the
CPU backend; the real-TPU run is exercised by the VL bench/drive)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oar_ocr_tpu.ops.flash_attention import flash_attention


def _qkv(rng, b=1, h=2, tq=256, tk=256, d=64):
    mk = lambda t: jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    return mk(tq), mk(tk), mk(tk)


def test_matches_reference(rng):
    q, k, v = _qkv(rng)
    ref = flash_attention(q, k, v, use_pallas=False)
    out = flash_attention(q, k, v, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fully_masked_row_outputs_zeros(rng):
    """valid_len == 0 (a fully-padded batch slot): every key is masked,
    so the output must be exact zeros in BOTH paths — without the
    explicit re-mask the kernel's p = exp(s − m_new) = 1 for every
    masked key and the row silently became mean(V)."""
    q, k, v = _qkv(rng)
    vlen = jnp.array([0] * q.shape[0], jnp.int32)
    out_k = np.asarray(flash_attention(q, k, v, valid_len=vlen,
                                       use_pallas=True, interpret=True))
    out_f = np.asarray(flash_attention(q, k, v, valid_len=vlen,
                                       use_pallas=False))
    assert np.all(out_k == 0.0)
    assert np.all(out_f == 0.0)


def test_causal(rng):
    q, k, v = _qkv(rng)
    ref = flash_attention(q, k, v, causal=True, use_pallas=False)
    out = flash_attention(q, k, v, causal=True, use_pallas=True,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_valid_len(rng):
    q, k, v = _qkv(rng, b=2)
    vlen = jnp.asarray([256, 100], jnp.int32)
    ref = flash_attention(q, k, v, valid_len=vlen, use_pallas=False)
    out = flash_attention(q, k, v, valid_len=vlen, use_pallas=True,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_unaligned_shapes(rng):
    """Tq/Tk/D not multiples of the block sizes."""
    q, k, v = _qkv(rng, tq=300, tk=200, d=48)
    ref = flash_attention(q, k, v, use_pallas=False)
    out = flash_attention(q, k, v, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_small_tq_falls_back(rng):
    """Decode-size queries route to the fused-XLA path."""
    q, k, v = _qkv(rng, tq=1, tk=256)
    out = flash_attention(q, k, v, use_pallas=True)
    ref = flash_attention(q, k, v, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

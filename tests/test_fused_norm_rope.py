"""Pallas fused add+RMSNorm and qk-norm+RoPE parity (interpret mode) —
SURVEY §2.5 "fused native decode ops" analogs."""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.ops.fused_norm_rope import (_add_rmsnorm_xla,
                                             _qk_norm_rope_xla,
                                             fused_add_rmsnorm,
                                             fused_qk_norm_rope)


def test_add_rmsnorm_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 64)).astype(np.float32)
    r = rng.normal(size=(2, 5, 64)).astype(np.float32)
    scale = rng.normal(size=(64,)).astype(np.float32)
    ref_o, ref_r = _add_rmsnorm_xla(jnp.asarray(x), jnp.asarray(r),
                                    jnp.asarray(scale), 1e-6)
    out, new_res = fused_add_rmsnorm(jnp.asarray(x), jnp.asarray(r),
                                     jnp.asarray(scale), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_res), np.asarray(ref_r),
                               atol=1e-6, rtol=1e-6)


def test_add_rmsnorm_uneven_rows():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(300, 32)).astype(np.float32)   # 300 % 256 != 0
    r = rng.normal(size=(300, 32)).astype(np.float32)
    scale = np.ones(32, np.float32)
    ref_o, _ = _add_rmsnorm_xla(jnp.asarray(x), jnp.asarray(r),
                                jnp.asarray(scale), 1e-6)
    out, _ = fused_add_rmsnorm(jnp.asarray(x), jnp.asarray(r),
                               jnp.asarray(scale), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o),
                               atol=1e-6, rtol=1e-6)


def test_qk_norm_rope_parity():
    rng = np.random.default_rng(2)
    R, T, D = 8, 9, 32
    x = rng.normal(size=(R, T, D)).astype(np.float32)
    scale = rng.normal(size=(D,)).astype(np.float32)
    pos = np.arange(T, dtype=np.float32)
    inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    freqs = pos[:, None] * inv[None]
    cos = np.cos(freqs).astype(np.float32)
    sin = np.sin(freqs).astype(np.float32)
    ref = _qk_norm_rope_xla(jnp.asarray(x), jnp.asarray(scale),
                            jnp.asarray(cos), jnp.asarray(sin), 1e-6)
    out = fused_qk_norm_rope(jnp.asarray(x), jnp.asarray(scale),
                             jnp.asarray(cos), jnp.asarray(sin),
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_qk_norm_rope_matches_module_semantics():
    """The fused op must equal RMSNorm(head_dim) then apply_rope — the
    Hunyuan/Qwen3 qk-norm + rotary step it replaces."""
    import jax

    from oar_ocr_tpu.vl.attention import apply_rope
    from oar_ocr_tpu.vl.paddleocr_vl import RMSNorm

    rng = np.random.default_rng(3)
    B, H, T, D = 1, 2, 4, 16
    x = rng.normal(size=(B, H, T, D)).astype(np.float32)
    scale = rng.normal(size=(D,)).astype(np.float32)
    pos = np.arange(T, dtype=np.float32)
    inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    freqs = pos[:, None] * inv[None]
    cos = np.cos(freqs).astype(np.float32)
    sin = np.sin(freqs).astype(np.float32)

    norm = RMSNorm(eps=1e-6)
    nparams = {"params": {"scale": jnp.asarray(scale)}}
    ref = apply_rope(norm.apply(nparams, jnp.asarray(x)),
                     jnp.asarray(cos)[None, None],
                     jnp.asarray(sin)[None, None])
    out = fused_qk_norm_rope(
        jnp.asarray(x.reshape(B * H, T, D)), jnp.asarray(scale),
        jnp.asarray(cos), jnp.asarray(sin), interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(B, H, T, D),
                               np.asarray(ref), atol=1e-5, rtol=1e-5)

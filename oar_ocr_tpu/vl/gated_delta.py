"""Gated delta rule linear attention (OvisOCR2's hybrid layers).

Re-expresses oar-ocr-vl/src/ovisocr2/gated_delta.rs + gated_delta.cu:131 —
the CUDA sequential recurrence of the Gated DeltaNet update — as a
`lax.scan` over time with the per-head state matrix carried on device
(SURVEY §7 names this kernel's scan formulation as a hard part; the scan
body is a few small matmuls, which XLA maps to the MXU).

Recurrence per head (state S ∈ R^{d_k×d_v}):
    S_t = α_t · S_{t-1} · (I − β_t k_t k_tᵀ) + β_t k_t v_tᵀ
    o_t = S_tᵀ q_t
with scalar decay gate α_t ∈ (0,1) and write strength β_t ∈ (0,1).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gated_delta_rule(
    q: jax.Array,      # (B, H, T, Dk)
    k: jax.Array,      # (B, H, T, Dk)
    v: jax.Array,      # (B, H, T, Dv)
    alpha: jax.Array,  # (B, H, T) decay gate
    beta: jax.Array,   # (B, H, T) write strength
    initial_state: jax.Array | None = None,   # (B, H, Dk, Dv)
    *,
    return_state: bool = False,
    return_all_states: bool = False,
):
    """Full-sequence gated delta rule → (B, H, T, Dv) [, final state].

    ``return_all_states`` additionally returns EVERY per-step state
    (B, T, H, Dk, Dv) — states[:, j] is the state after folding input j.
    This is the speculative-rollback hook (vl/speculative.py): a verify
    block of K+1 tokens keeps all intermediate states so the orchestrator
    can resume from the last *accepted* position, which a length-trim
    (the KV-cache rollback) cannot express for a recurrent state."""

    b, h, t, dk = q.shape
    dv = v.shape[-1]

    def step(s, inp):
        qt, kt, vt, at, bt = inp
        # s: (B, H, Dk, Dv)
        # (I − β k kᵀ) S = S − β k (kᵀ S)
        ks = jnp.einsum("bhk,bhkv->bhv", kt, s)          # kᵀS: (B,H,Dv)
        s = at[..., None, None] * (
            s - bt[..., None, None] * jnp.einsum("bhk,bhv->bhkv", kt, ks))
        s = s + bt[..., None, None] * jnp.einsum("bhk,bhv->bhkv", kt, vt)
        o = jnp.einsum("bhkv,bhk->bhv", s, qt)
        return s, ((o, s) if return_all_states else o)

    s0 = (initial_state.astype(jnp.float32) if initial_state is not None
          else jnp.zeros((b, h, dk, dv), jnp.float32))
    xs = (q.transpose(2, 0, 1, 3).astype(jnp.float32),
          k.transpose(2, 0, 1, 3).astype(jnp.float32),
          v.transpose(2, 0, 1, 3).astype(jnp.float32),
          alpha.transpose(2, 0, 1).astype(jnp.float32),
          beta.transpose(2, 0, 1).astype(jnp.float32))
    s_final, out = jax.lax.scan(step, s0, xs)
    if return_all_states:
        out, states = out
        states = states.transpose(1, 0, 2, 3, 4)         # (B, T, H, Dk, Dv)
    out = out.transpose(1, 2, 0, 3).astype(q.dtype)      # (B, H, T, Dv)
    if return_all_states:
        return out, states
    if return_state:
        return out, s_final
    return out


def gated_delta_rule_chunked(
    q: jax.Array,      # (B, H, T, Dk)
    k: jax.Array,      # (B, H, T, Dk)
    v: jax.Array,      # (B, H, T, Dv)
    alpha: jax.Array,  # (B, H, T) decay gate
    beta: jax.Array,   # (B, H, T) write strength
    initial_state: jax.Array | None = None,   # (B, H, Dk, Dv)
    *,
    chunk: int = 64,
    return_state: bool = False,
):
    """Blockwise gated delta rule — the MXU formulation (SURVEY §7
    "gated delta rule → associative-scan formulation"; the chunked WY
    form of the DeltaNet literature, exact to float rounding vs the
    sequential scan).

    Derivation (state S_t = α_t(I − β_t k_t k_tᵀ)S_{t-1} + β_t k_t v_tᵀ,
    chunk positions i = 1..C, γ_i = ∏_{s≤i} α_s from the chunk start):

        S_j = γ_j S_0 + Σ_{i≤j} (γ_j/γ_i) k_i y_iᵀ

    with the pseudo-values Y solving the unit-lower-triangular system

        (I + diag(β)·D) Y = diag(β)(V − γ∘(K S_0)),
        D[i,m] = (γ_i/γ_m)(k_i·k_m)  for m < i,

    outputs O = γ∘(Q S_0) + (E ⊙ QKᵀ) Y with E[j,i] = γ_j/γ_i (i ≤ j),
    and chunk-end state S_C = γ_C S_0 + Kᵀ((γ_C/γ)∘Y). Every decay
    ratio has i ≤ j so all factors are ≤ 1 — no overflow. One chunk is
    a handful of (C×D) matmuls instead of C sequential rank-1 updates;
    the T-sequential `lax.scan` runs over T/chunk carries only.

    Semantics identical to :func:`gated_delta_rule` (the parity oracle,
    tests/test_vl_mechanisms.py)."""

    b, h, t, dk = q.shape
    dv = v.shape[-1]
    c = min(chunk, max(t, 1))
    n = -(-t // c)                    # chunks
    pad = n * c - t

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    af = alpha.astype(jnp.float32)
    bf = beta.astype(jnp.float32)
    if pad:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # pad steps are no-ops: α=1 keeps the state, β=0 writes nothing
        af = jnp.pad(af, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
        bf = jnp.pad(bf, ((0, 0), (0, 0), (0, pad)))

    def reshape(x):
        return x.reshape(b, h, n, c, *x.shape[3:]).transpose(
            2, 0, 1, 3, *range(4, x.ndim + 1))

    qc, kc, vc = reshape(qf), reshape(kf), reshape(vf)   # (n,B,H,C,D)
    ac, bc = reshape(af), reshape(bf)                    # (n,B,H,C)

    tri_lo = jnp.tril(jnp.ones((c, c), bool), -1)        # strict lower
    tri_le = jnp.tril(jnp.ones((c, c), bool))            # incl diagonal
    eye = jnp.eye(c, dtype=jnp.float32)

    def chunk_step(s, inp):
        qi, ki, vi, ai, bi = inp                 # (B,H,C,·)
        g = jnp.cumsum(jnp.log(jnp.maximum(ai, 1e-30)), axis=-1)
        r0 = jnp.exp(g)                          # γ_i        (B,H,C)
        ratio = jnp.exp(g[..., :, None] - g[..., None, :])  # γ_i/γ_m
        ks0 = jnp.einsum("bhck,bhkv->bhcv", ki, s,
                         precision=jax.lax.Precision.HIGHEST)
        rhs = bi[..., None] * (vi - r0[..., None] * ks0)
        kk = jnp.einsum("bhik,bhmk->bhim", ki, ki,
                        precision=jax.lax.Precision.HIGHEST)
        m = eye + jnp.where(tri_lo, bi[..., :, None] * ratio * kk, 0.0)
        y = jax.scipy.linalg.solve_triangular(
            m, rhs, lower=True, unit_diagonal=True)
        qk = jnp.einsum("bhjk,bhik->bhji", qi, ki,
                        precision=jax.lax.Precision.HIGHEST)
        e = jnp.where(tri_le, ratio, 0.0)
        o = (r0[..., None] * jnp.einsum(
            "bhck,bhkv->bhcv", qi, s,
            precision=jax.lax.Precision.HIGHEST)
            + jnp.einsum("bhji,bhiv->bhjv", e * qk, y,
                         precision=jax.lax.Precision.HIGHEST))
        g_c = g[..., -1:]
        s = (jnp.exp(g_c)[..., None] * s
             + jnp.einsum("bhck,bhcv->bhkv", ki,
                          jnp.exp(g_c - g)[..., None] * y,
                          precision=jax.lax.Precision.HIGHEST))
        return s, o

    s0 = (initial_state.astype(jnp.float32) if initial_state is not None
          else jnp.zeros((b, h, dk, dv), jnp.float32))
    s_final, out = jax.lax.scan(chunk_step, s0, (qc, kc, vc, ac, bc))
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, h, n * c, dv)
    out = out[:, :, :t].astype(q.dtype)
    if return_state:
        return out, s_final
    return out


def gated_delta_step(s: jax.Array, q: jax.Array, k: jax.Array, v: jax.Array,
                     alpha: jax.Array, beta: jax.Array
                     ) -> Tuple[jax.Array, jax.Array]:
    """Single decode step: state (B,H,Dk,Dv) + token-t inputs (B,H,D…) →
    (new_state, output (B,H,Dv)). The linear-attention analog of a KV-cache
    update (O(1) state instead of a growing cache)."""

    ks = jnp.einsum("bhk,bhkv->bhv", k, s)
    s = alpha[..., None, None] * (
        s - beta[..., None, None] * jnp.einsum("bhk,bhv->bhkv", k, ks))
    s = s + beta[..., None, None] * jnp.einsum("bhk,bhv->bhkv", k, v)
    o = jnp.einsum("bhkv,bhk->bhv", s, q)
    return s, o

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
):
    """Full-sequence gated delta rule → (B, H, T, Dv) [, final state]."""

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
        return s, o

    s0 = (initial_state.astype(jnp.float32) if initial_state is not None
          else jnp.zeros((b, h, dk, dv), jnp.float32))
    xs = (q.transpose(2, 0, 1, 3).astype(jnp.float32),
          k.transpose(2, 0, 1, 3).astype(jnp.float32),
          v.transpose(2, 0, 1, 3).astype(jnp.float32),
          alpha.transpose(2, 0, 1).astype(jnp.float32),
          beta.transpose(2, 0, 1).astype(jnp.float32))
    s_final, out = jax.lax.scan(step, s0, xs)
    out = out.transpose(1, 2, 0, 3).astype(q.dtype)      # (B, H, T, Dv)
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

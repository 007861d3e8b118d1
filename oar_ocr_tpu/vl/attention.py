"""Unified attention for the VLM stack: SDPA, GQA, masks, RoPE/MRoPE.

Re-expresses oar-ocr-vl/src/attention.rs:1-1498 — the single attention
module shared by every VLM family: scaled-dot-product attention with
grouped-query support, causal / left-padding / generation masks and their
combination, and rotary embeddings including multimodal 3-D MRoPE
(ernie.rs:26 apply_multimodal_rotary_pos_emb) and XDRoPE.

TPU-first: plain jnp einsum attention — XLA fuses QK^T+mask+softmax+PV
well at these sizes (vision ≤ ~8k tokens, decode T=1); a Pallas
flash/splash kernel is the follow-up optimization for long-prompt prefill.
All helpers are shape-static and jit-safe.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def scaled_dot_product_attention(
    q: jax.Array,                # (B, Hq, Tq, D)
    k: jax.Array,                # (B, Hkv, Tk, D)
    v: jax.Array,                # (B, Hkv, Tk, D)
    mask: Optional[jax.Array] = None,   # broadcastable to (B, Hq, Tq, Tk); True=attend
    scale: Optional[float] = None,
) -> jax.Array:
    """SDPA with GQA: Hq must be a multiple of Hkv
    (attention.rs scaled_dot_product_attention_gqa)."""

    b, hq, tq, d = q.shape
    hkv = k.shape[1]
    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    weights = weights.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


# ------------------------------- masks -------------------------------

def create_causal_mask(t: int, dtype=bool) -> jax.Array:
    """(1, 1, T, T) lower-triangular attend mask (attention.rs
    create_causal_mask)."""
    m = jnp.tril(jnp.ones((t, t), bool))
    return m[None, None]


def create_left_padding_mask(valid_lengths: jax.Array, t: int) -> jax.Array:
    """(B, 1, 1, T): position j attends iff j >= t - valid_len[b]
    (left-aligned padding at the FRONT — attention.rs
    create_left_padding_mask)."""
    pos = jnp.arange(t)[None, :]
    start = (t - valid_lengths)[:, None]
    return (pos >= start)[:, None, None, :]


def create_generation_mask(kv_len: jax.Array, capacity: int,
                           pad_len: Optional[jax.Array] = None) -> jax.Array:
    """(B, 1, 1, C): during decode, attend to cache slots < kv_len —
    excluding the first ``pad_len[b]`` slots, which hold K/V written for
    left-padding tokens during a left-padded prefill (attention.rs:660-692
    masks pos < pad_len per row so unequal prompt lengths in one batch do
    not attend padding)."""
    pos = jnp.arange(capacity)[None, :]
    keep = pos < kv_len[:, None]
    if pad_len is not None:
        keep = keep & (pos >= pad_len[:, None])
    return keep[:, None, None, :]


def combine_masks(*masks: Optional[jax.Array]) -> Optional[jax.Array]:
    """Logical AND of attend masks (attention.rs combine_masks)."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else (out & m)
    return out


# ------------------------------- RoPE -------------------------------

def rope_frequencies(dim: int, max_pos: int, theta: float = 10000.0
                     ) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables (max_pos, dim/2)."""
    inv = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate (…, T, D) given per-position cos/sin (…, T, D/2).
    Half-split convention (HF/Ernie style: x = [x1, x2], rotate pairs
    (x1[i], x2[i]))."""

    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def mrope_cos_sin(position_ids: jax.Array, dim: int,
                  mrope_sections: Tuple[int, ...],
                  theta: float = 10000.0) -> Tuple[jax.Array, jax.Array]:
    """3-D multimodal RoPE tables.

    ``position_ids``: (3, B, T) — temporal / height / width position per
    token (ernie.rs:26 apply_multimodal_rotary_pos_emb; Qwen2-VL MRoPE).
    ``mrope_sections``: how many frequency pairs each axis owns; sums to
    dim/2. Returns cos/sin of shape (B, T, dim/2) with each frequency band
    indexed by its axis's position stream.
    """

    inv = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    # (3, B, T, dim/2)
    freqs = position_ids[..., None].astype(jnp.float32) * inv
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    parts_c, parts_s = [], []
    start = 0
    for axis, width in enumerate(mrope_sections):
        parts_c.append(cos[axis, ..., start:start + width])
        parts_s.append(sin[axis, ..., start:start + width])
        start += width
    return (jnp.concatenate(parts_c, -1), jnp.concatenate(parts_s, -1))

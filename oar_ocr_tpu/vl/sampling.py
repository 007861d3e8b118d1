"""Sampling utilities: repetition penalty, on-device sampling, loop truncation.

Re-expresses the reference's decode-side sampling helpers: the CUDA
repetition-penalty / masked-argmax / sample-with-confidence kernels
(oar-ocr-vl/src/hunyuanocr/dynamic_kv.cu:119,:871 and cuda_kernels.rs:10-24)
as jit ops, and the host-side repetition truncation of utils.rs (cutting
degenerate loops out of decoded text).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def apply_repetition_penalty(logits: jax.Array, history: jax.Array,
                             penalty: float, vocab_size: int) -> jax.Array:
    """Penalize tokens present in ``history`` (B, H) int32 (pad with -1):
    positive logits divided by, negative multiplied by, ``penalty``
    (dynamic_kv.cu:119 repetition_penalty_f32 semantics)."""

    b, v = logits.shape
    seen = jnp.zeros((b, v), bool)
    hist = jnp.clip(history, 0, vocab_size - 1)
    valid = history >= 0
    seen = seen.at[jnp.arange(b)[:, None], hist].max(valid)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def mask_token_ids(logits: jax.Array, banned: Sequence[int]) -> jax.Array:
    """Hard-mask banned ids (cuda_kernels.rs MaskTokenIds)."""
    if not banned:
        return logits
    idx = jnp.asarray(list(banned), jnp.int32)
    return logits.at[:, idx].set(jnp.finfo(logits.dtype).min)


def sample_with_confidence(logits: jax.Array, key: jax.Array,
                           temperature: float = 1.0,
                           top_p: float = 1.0
                           ) -> Tuple[jax.Array, jax.Array]:
    """On-device (token, probability) sampling — greedy when temperature
    <= 0 (dynamic_kv.cu:871 sample_with_confidence)."""

    if temperature <= 0:
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        p = jnp.max(jax.nn.softmax(logits, -1), -1)
        return tok, p
    scaled = logits / temperature
    probs = jax.nn.softmax(scaled, -1)
    if top_p < 1.0:
        sorted_p = jnp.sort(probs, -1)[:, ::-1]
        csum = jnp.cumsum(sorted_p, -1)
        k = jnp.sum(csum < top_p, -1) + 1
        thresh = jnp.take_along_axis(sorted_p, (k - 1)[:, None], axis=1)
        probs = jnp.where(probs >= thresh, probs, 0.0)
        probs = probs / jnp.sum(probs, -1, keepdims=True)
    tok = jax.random.categorical(key, jnp.log(jnp.clip(probs, 1e-20)))
    p = jnp.take_along_axis(probs, tok[:, None], axis=1)[:, 0]
    return tok.astype(jnp.int32), p


def truncate_repetition(text: str, *, min_len: int = 4,
                        min_repeats: int = 6) -> str:
    """Cut degenerate repetition loops from decoded text (oar-ocr-vl
    utils.rs repetition truncation): when the tail is >= min_repeats
    consecutive copies of the same substring, keep one copy and stop."""

    n = len(text)
    for size in range(min_len, max(min_len, n // min_repeats) + 1):
        unit = text[n - size : n]
        if not unit:
            continue
        repeats = 1
        pos = n - size
        while pos - size >= 0 and text[pos - size : pos] == unit:
            repeats += 1
            pos -= size
        if repeats >= min_repeats:
            return text[: pos + size]
    return text

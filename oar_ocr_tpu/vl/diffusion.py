"""SDAR block-diffusion decoding schedule (MinerU-Diffusion-V1).

Re-expresses the decode mechanism of oar-ocr-vl/src/mineru_diffusion/
model.rs:1-12: the decoder generates a block of L tokens at once by
iterative unmasking — every step predicts ALL currently-masked positions
in parallel, then commits ("transfers") the most confident ones according
to a threshold/schedule until the block is fully unmasked, after which the
block's KV is committed and the next block starts. The per-step
all-masked-positions prediction is free parallelism on the MXU (SURVEY
§2.7 "block-diffusion parallel unmasking — port as-is").

This module implements the schedule math jit-side; the token predictor
plugs in as a callable (full model families arrive with converted
weights).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

MASK_ID = -1


class UnmaskState(NamedTuple):
    tokens: jax.Array     # (B, L) int32, MASK_ID where still masked
    done: jax.Array       # (B,) bool


def transfer_count(step: int, num_steps: int, block_len: int) -> int:
    """Linear transfer schedule: by step s, ⌈L·(s+1)/num_steps⌉ tokens are
    committed (the reference supports threshold + schedule; the schedule
    bounds worst-case steps)."""

    return max(1, -(-block_len * (step + 1) // num_steps))


def unmask_step(
    tokens: jax.Array,          # (B, L) current block, MASK_ID = masked
    logits: jax.Array,          # (B, L, V) predictions for every position
    *,
    confidence_threshold: float,
    min_transfer: int,
) -> jax.Array:
    """One unmasking step: commit every masked position whose confidence
    exceeds the threshold, and always at least the ``min_transfer`` most
    confident masked positions (so progress is guaranteed)."""

    b, l, v = logits.shape
    probs = jax.nn.softmax(logits, -1)
    conf = jnp.max(probs, -1)                              # (B, L)
    pred = jnp.argmax(logits, -1).astype(jnp.int32)
    masked = tokens == MASK_ID

    conf_masked = jnp.where(masked, conf, -jnp.inf)
    # rank of each masked position by confidence (0 = most confident)
    order = jnp.argsort(-conf_masked, axis=1)
    rank = jnp.argsort(order, axis=1)
    take = masked & ((conf >= confidence_threshold) | (rank < min_transfer))
    return jnp.where(take, pred, tokens)


def decode_block(
    predictor: Callable[[jax.Array], jax.Array],   # tokens (B,L) → logits (B,L,V)
    block_len: int,
    batch: int,
    *,
    num_steps: int = 8,
    confidence_threshold: float = 0.9,
) -> jax.Array:
    """Iteratively unmask one block to completion (≤ num_steps predictor
    calls, all inside one jit when ``predictor`` is traceable)."""

    tokens0 = jnp.full((batch, block_len), MASK_ID, jnp.int32)

    def body(step, tokens):
        logits = predictor(tokens)
        return unmask_step(
            tokens, logits,
            confidence_threshold=confidence_threshold,
            min_transfer=transfer_count(step, num_steps, block_len)
            - transfer_count(step - 1, num_steps, block_len)
            if step > 0 else transfer_count(0, num_steps, block_len))

    # static unroll keeps per-step min_transfer a Python int
    tokens = tokens0
    for s in range(num_steps):
        tokens = jax.lax.cond(
            jnp.any(tokens == MASK_ID),
            lambda t: body(s, t), lambda t: t, tokens)
    return tokens

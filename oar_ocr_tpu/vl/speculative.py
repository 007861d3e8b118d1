"""Speculative decoding primitives: draft → single-pass verify → rollback.

Re-expresses the mechanisms behind the reference's two speculative
families (SURVEY §2.5):
- GLM-OCR **MTP**: one trained multi-token-prediction layer reused
  recurrently to draft N tokens, verified by the target in one causal pass
  (glmocr/mtp.rs:1-6, verify at text.rs:1198);
- HunyuanOCR **DFlash**: a block draft model predicting a masked block
  non-causally, verified the same way (hunyuanocr/dflash.rs:1-7).

The TPU-native core both share is implemented here jit-side:
``verify_draft`` compares target argmaxes against the draft block and
accepts the longest agreeing prefix (+1 corrected token), and the KV cache
rolls back via a length reset (vl/kv_cache.KVCache.trim_to) — the
speculative-rollback design the reference builds its ``TrimmableKvCache``
around. Family-specific draft networks plug in as callables.

Speculation ∧ linear-attention: rollback here is a KV *length* reset,
which full-attention caches support for free. A GatedDeltaNet layer
(llm_decoders.GatedDeltaNetLayer — OvisOCR2's hybrid) instead folds every
token into a recurrent (dstate, conv_state) that a length reset cannot
undo. The reference AVOIDS rather than solves this — none of its
speculative families (GLM MTP, Hunyuan DFlash) contain delta layers, and
Ovis decodes greedily. Here it IS solved: the verify block collects
per-step recurrent states (gated_delta_rule ``return_all_states`` →
UnifiedDecoder ``collect_states`` → exact_models.decode_block_spec) and
the orchestrator resumes from the state at the last accepted position —
so hybrid delta stacks ride speculation too (ExactVLM.generate_speculative).

Hybrid stacks have no trained draft head (Ovis ships none), so their
draft source is :func:`ngram_draft` — training-free prompt-lookup
drafting (match the last n-gram against the already-committed tokens and
propose the continuation). OCR output is highly self-repetitive (table
markup, repeated field names), which is exactly where n-gram lookup
shines; greedy exactness is preserved regardless of draft quality because
every emitted token comes from the target's own argmax (verify_draft).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .kv_cache import KVCache


class VerifyResult(NamedTuple):
    accepted: jax.Array       # (B,) int32 — number of draft tokens accepted
    next_tokens: jax.Array    # (B, K+1) int32 — accepted prefix + correction
    num_emitted: jax.Array    # (B,) int32 — accepted + 1


def verify_draft(draft_tokens: jax.Array,
                 target_logits: jax.Array) -> VerifyResult:
    """Greedy speculative verification.

    ``draft_tokens`` (B, K): the draft block. ``target_logits`` (B, K+1, V):
    target logits at the position *before* each draft token plus one extra
    position (the standard verify pass over [last_committed, draft...]).

    Token i is accepted iff the target's argmax at position i equals
    draft[i] AND all earlier drafts were accepted. The emitted sequence is
    the accepted prefix followed by the target's own argmax at the first
    disagreement (or the bonus K+1-th token when everything matched).
    """

    b, k = draft_tokens.shape
    target = jnp.argmax(target_logits, -1).astype(jnp.int32)   # (B, K+1)
    match = target[:, :k] == draft_tokens                      # (B, K)
    prefix_ok = jnp.cumprod(match.astype(jnp.int32), axis=1)
    accepted = jnp.sum(prefix_ok, axis=1).astype(jnp.int32)    # (B,)

    # emitted[i] = draft[i] for i < accepted; emitted[accepted] = target
    # correction at that position; positions beyond are padding (repeat)
    pos = jnp.arange(k + 1)[None, :]
    emitted = jnp.where(pos < accepted[:, None],
                        jnp.pad(draft_tokens, ((0, 0), (0, 1))),
                        jnp.take_along_axis(target, jnp.minimum(
                            jnp.maximum(pos, accepted[:, None]),
                            k * jnp.ones_like(pos)), axis=1))
    emitted = jnp.where(pos <= accepted[:, None], emitted,
                        emitted[:, :1] * 0 - 1)                # -1 pad
    return VerifyResult(accepted, emitted.astype(jnp.int32), accepted + 1)


def rollback_cache(cache: KVCache, committed_length: jax.Array) -> KVCache:
    """Discard speculated cache entries beyond the committed length
    (kv_trim.rs trim_to semantics)."""
    return cache.trim_to(committed_length)


def ngram_draft(hist: jax.Array, length: jax.Array, *, k: int,
                n: int = 2) -> jax.Array:
    """Training-free prompt-lookup drafting (jit-safe, static shapes).

    ``hist`` (B, CAP) int32 holds the committed token stream (prompt text
    + generated so far), ``length`` (B,) its live prefix length. Finds the
    most recent EARLIER occurrence of the trailing ``n``-gram and proposes
    the ``k`` tokens that followed it; rows with no match draft the last
    token repeated (harmless — wrong drafts are simply rejected by
    verify_draft, so exactness never depends on draft quality)."""

    b, cap = hist.shape
    starts = jnp.maximum(length - n, 0)                      # (B,)
    gram = jax.vmap(
        lambda h, s: jax.lax.dynamic_slice(h, (s,), (n,)))(hist, starts)
    w = max(cap - n, 1)
    i = jnp.arange(w)                                        # window starts
    wins = hist[:, i[:, None] + jnp.arange(n)[None]]         # (B, W, n)
    match = (wins == gram[:, None, :]).all(-1)               # (B, W)
    # a usable window ends strictly before the trailing gram itself and
    # has at least one committed continuation token
    valid = (i[None, :] + n) <= (length[:, None] - 1)
    score = jnp.where(match & valid, i[None, :] + 1, 0)
    best = jnp.max(score, axis=1)                            # 0 = no match
    has = best > 0
    cont = jnp.where(has, best - 1 + n, 0)                   # continuation
    drafts = jax.vmap(
        lambda h, s: jax.lax.dynamic_slice(h, (s,), (k,)))(hist, cont)
    last = jnp.take_along_axis(
        hist, jnp.maximum(length - 1, 0)[:, None], axis=1)   # (B, 1)
    drafts = jnp.where(has[:, None], drafts,
                       jnp.broadcast_to(last, (b, k)))
    # a matched continuation that extends past `length` reads -1 history
    # padding; clamp to the last committed token so the verify block never
    # embeds an out-of-vocab id (a wrong draft is simply rejected)
    drafts = jnp.where(drafts < 0, jnp.broadcast_to(last, (b, k)), drafts)
    return drafts.astype(jnp.int32)


class MTPDraftState(NamedTuple):
    """Recurrent state of an MTP draft layer between draft steps."""

    hidden: jax.Array          # (B, D) last target hidden state
    token: jax.Array           # (B,) last committed token


def recurrent_draft(draft_step: Callable, state: MTPDraftState,
                    k: int) -> Tuple[jax.Array, MTPDraftState]:
    """Roll one draft layer K times (GLM MTP: the single trained layer is
    reused recurrently, mtp.rs:1-6). ``draft_step(hidden, token) →
    (new_hidden, logits)``. Returns (draft_tokens (B, K), final state)."""

    def body(carry, _):
        h, tok = carry
        h, logits = draft_step(h, tok)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return (h, nxt), nxt

    (h, tok), drafts = jax.lax.scan(body, (state.hidden, state.token),
                                    None, length=k)
    return jnp.transpose(drafts, (1, 0)), MTPDraftState(h, tok)

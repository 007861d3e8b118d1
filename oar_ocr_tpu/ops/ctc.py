"""Fused on-device greedy CTC decode.

TPU-native replacement for the reference's host CTC path, which copies the
full (B, T, vocab) probability tensor off the inference engine — the copy
"can exceed the inference time" (oar-ocr-core/src/core/inference/
ort_infer_execution.rs:224-231) — and then argmaxes on CPU
(processors/decode.rs:27-31,192-217).

Here the argmax + dedup happen on device inside the recognition jit; the
host receives only three (B, T) arrays (indices, max-probs, keep-mask) — a
~vocab-fold bandwidth reduction (vocab is 6.9k–18.7k) — and performs pure
dictionary lookup.

Parity-critical semantics reproduced exactly (SURVEY §8):
- per-timestep argmax with **last-max-wins** tie-break (decode.rs:27-31);
  ``jnp.argmax`` is first-max-wins, so we argmax the reversed vocab axis.
- keep a timestep iff idx != blank AND idx != prev_idx, where prev is the
  previous *raw* timestep index (dedup before blank filtering,
  decode.rs:192-217).
- blank index 0 (decode.rs:348-365).
- confidence = mean of kept-char probs, 0.0 if none kept (decode.rs:241-256).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class CTCRaw(NamedTuple):
    """Device-side decode result, (B, T) each."""

    indices: jax.Array    # int32 argmax index per timestep (last-max-wins)
    probs: jax.Array      # float32 probability of the argmax class
    keep: jax.Array       # bool: contributes a character


def pack_ctc_raw(raw: CTCRaw) -> jax.Array:
    """Fold (indices, probs, keep) into ONE (B, T, 6) uint8 array so a
    chunk costs a single device→host fetch instead of three (the axon
    tunnel charges ~30 ms RTT per fetch — docs/environment-variables.md)
    at 6 B/timestep instead of three f32 planes' 12: bytes 0-1 = index
    as int16 where kept else −1 (CTC charsets are ≤ 18.7k, well inside
    int16; CTCLabelDecoder enforces the bound), bytes 2-5 = prob f32
    bit-exact (the mean-prob confidence must match the host oracle to
    the ulp). Pad rows with 0xFF: idx −1 ⇒ keep False, prob bytes never
    read."""
    idx = jnp.where(raw.keep, raw.indices, -1).astype(jnp.int16)
    ib = jax.lax.bitcast_convert_type(idx, jnp.uint8)        # (B, T, 2)
    pb = jax.lax.bitcast_convert_type(
        raw.probs.astype(jnp.float32), jnp.uint8)            # (B, T, 4)
    return jnp.concatenate([ib, pb], axis=-1)


def unpack_ctc_raw(packed: np.ndarray
                   ) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Host inverse of pack_ctc_raw → (indices, probs, keep) np arrays."""
    flat = np.ascontiguousarray(packed, np.uint8).reshape(-1, 6)
    idx16 = flat[:, :2].copy().view(np.int16)[:, 0]
    prob = flat[:, 2:].copy().view(np.float32)[:, 0]
    shape = packed.shape[:-1]
    keep = (idx16 >= 0).reshape(shape)
    idx = np.where(idx16 >= 0, idx16, 0).astype(np.int32).reshape(shape)
    return idx, prob.reshape(shape), keep


@functools.partial(jax.jit, static_argnames=("k",))
def gather_kept_ctc(packed: jax.Array, *, k: int) -> jax.Array:
    """(B, T, 6) pack_ctc_raw output → (B, 4 + k·8) uint8 kept-only
    payload: the dictionary decoder only ever reads KEPT columns
    (CTCLabelDecoder.decode_with_positions — chars, mean-prob confidence
    and word-box columns all come from ``nonzero(keep)``), and kept
    timesteps are a small fraction of T (text length ≪ width/stride), so
    shipping only them cuts the rec d2h payload several-fold on degraded
    links. Layout per row: bytes 0-3 = kept count (int32); then k int16
    column indices (kept-first, ascending); then k 6-byte packed entries.
    count > k signals the host its budget guess overflowed → refetch the
    full packed array. Decode-lossless by construction when count ≤ k."""
    b, t, _ = packed.shape
    idx16 = jax.lax.bitcast_convert_type(packed[..., :2], jnp.int16)
    keep = idx16 >= 0                                # (B, T)
    count = jnp.sum(keep, axis=-1).astype(jnp.int32)[:, None]
    score = keep.astype(jnp.int32) * (2 * t) - jnp.arange(
        t, dtype=jnp.int32)[None, :]
    _, cols = jax.lax.top_k(score, k)                # kept first, asc
    data = jnp.take_along_axis(packed, cols[:, :, None], axis=1)
    cb = jax.lax.bitcast_convert_type(count, jnp.uint8).reshape(b, 4)
    colb = jax.lax.bitcast_convert_type(
        cols.astype(jnp.int16), jnp.uint8).reshape(b, 2 * k)
    return jnp.concatenate([cb, colb, data.reshape(b, 6 * k)], axis=-1)


def unpack_kept_ctc(payload: np.ndarray, k: int, t: int
                    ) -> "Optional[tuple[np.ndarray, np.ndarray, np.ndarray]]":
    """Host inverse of gather_kept_ctc → (indices, probs, keep) (B, t)
    arrays identical to ``unpack_ctc_raw`` of the full transfer, or None
    when any row's kept count overflowed the budget (caller refetches)."""
    b = payload.shape[0]
    counts = payload[:, :4].copy().view(np.int32)[:, 0]
    if b and int(counts.max()) > k:
        return None
    cols = payload[:, 4:4 + 2 * k].copy().view(np.int16).reshape(b, k)
    entries = np.ascontiguousarray(
        payload[:, 4 + 2 * k:4 + 8 * k]).reshape(b, k, 6)
    e_idx = entries[:, :, :2].copy().reshape(-1, 2).view(np.int16)[:, 0]
    e_prob = entries[:, :, 2:].copy().reshape(-1, 4).view(np.float32)[:, 0]
    valid = (np.arange(k)[None, :] < counts[:, None]).ravel()
    rows = np.repeat(np.arange(b), k)[valid]
    cpos = cols.ravel().astype(np.int64)[valid]
    idx = np.zeros((b, t), np.int32)
    prob = np.zeros((b, t), np.float32)
    keep = np.zeros((b, t), bool)
    idx[rows, cpos] = np.maximum(e_idx[valid], 0).astype(np.int32)
    prob[rows, cpos] = e_prob[valid]
    keep[rows, cpos] = True
    return idx, prob, keep


def argmax_last(x: jax.Array, axis: int = -1) -> jax.Array:
    """Argmax with last-max-wins tie-breaking (decode.rs:27-31)."""
    n = x.shape[axis]
    rev = jnp.flip(x, axis=axis)
    return (n - 1) - jnp.argmax(rev, axis=axis).astype(jnp.int32)


def ctc_greedy_decode(
    probs: jax.Array,
    *,
    blank: int = 0,
    valid_lengths: Optional[jax.Array] = None,
    inputs_are_logits: bool = False,
) -> CTCRaw:
    """Greedy CTC decode of (B, T, V) probabilities, fully on device.

    ``valid_lengths`` (B,) masks out pad timesteps of width-bucketed batches.
    If ``inputs_are_logits``, max-prob is computed as exp(max - logsumexp)
    without materializing the softmax.
    """

    b, t, v = probs.shape
    idx = argmax_last(probs, axis=-1)                       # (B, T)
    if inputs_are_logits:
        m = jnp.max(probs, axis=-1)
        p = jnp.exp(m - jax.nn.logsumexp(probs, axis=-1))
    else:
        p = jnp.take_along_axis(probs, idx[..., None], axis=-1)[..., 0]

    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, jnp.int32), idx[:, :-1]], axis=1)
    keep = (idx != blank) & (idx != prev)
    if valid_lengths is not None:
        tpos = jnp.arange(t, dtype=jnp.int32)[None, :]
        keep = keep & (tpos < valid_lengths[:, None])
    return CTCRaw(idx.astype(jnp.int32), p.astype(jnp.float32), keep)


class CTCLabelDecoder:
    """Host-side dictionary mapping (BaseRecLabelDecode, decode.rs:54).

    vocab = ['\\0' blank] + dict chars (+ ' ' if use_space_char), blank index
    0 (decode.rs:348-365). Emits text + confidence (+ per-char positions for
    word boxes, the apply_with_positions variant decode.rs:452-496).
    """

    def __init__(self, charset: Sequence[str], *, use_space_char: bool = True,
                 reverse: bool = False):
        chars = list(charset)
        if use_space_char:
            chars.append(" ")
        self.charset: List[str] = chars
        self.vocab_size = 1 + len(chars)  # +1 for blank at 0
        if self.vocab_size > 32767:       # pack_ctc_raw int16 domain
            from ..errors import InvalidInputError

            raise InvalidInputError(
                "charset too large for the int16 CTC transfer packing",
                vocab_size=self.vocab_size)
        # RTL scripts (e.g. Arabic recognizers): reverse run order after
        # decoding (decode.rs:22-24,137 pred_reverse)
        self.reverse = reverse

    def __call__(self, raw: CTCRaw | Tuple[np.ndarray, np.ndarray, np.ndarray]
                 ) -> List[Tuple[str, float]]:
        return [r[:2] for r in self.decode_with_positions(raw)]

    def decode_with_positions(
        self, raw
    ) -> List[Tuple[str, float, List[int]]]:
        """Returns (text, confidence, kept column indices) per sample."""
        idx = np.asarray(raw[0])
        prob = np.asarray(raw[1])
        keep = np.asarray(raw[2])
        out: List[Tuple[str, float, List[int]]] = []
        for bi in range(idx.shape[0]):
            cols = np.nonzero(keep[bi])[0]
            chars = []
            for c in cols:
                ci = int(idx[bi, c]) - 1  # shift past blank
                if 0 <= ci < len(self.charset):
                    chars.append(self.charset[ci])
                else:
                    chars.append("")  # ignored token (out-of-dict id)
            text = "".join(chars)
            if self.reverse:
                text = pred_reverse(text)
            conf = float(prob[bi, cols].mean()) if cols.size else 0.0
            out.append((text, conf, cols.tolist()))
        return out


import re

_LATIN_RUN = re.compile(r"[a-zA-Z0-9 :*\./%+-]+")


def pred_reverse(text: str) -> str:
    """RTL prediction reversal (decode.rs:22-24 pred_reverse): split into
    alphanumeric runs (kept LTR internally) and other characters, then
    reverse the run order — Arabic text reads right-to-left while embedded
    latin/digits keep their direction."""

    if not text:
        return text
    runs: List[str] = []
    pos = 0
    for m in _LATIN_RUN.finditer(text):
        for ch in text[pos : m.start()]:
            runs.append(ch)
        runs.append(m.group(0))
        pos = m.end()
    for ch in text[pos:]:
        runs.append(ch)
    return "".join(reversed(runs))


def load_charset(path: str) -> List[str]:
    """Load a PP-OCR dictionary file: one character per line
    (utils/dict.rs:35)."""
    with open(path, "r", encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f if line.rstrip("\n") != ""]


@functools.lru_cache(maxsize=1)
def default_charset() -> Tuple[str, ...]:
    """Printable-ASCII fallback charset used when no dictionary file is
    provided (development / tests). Real deployments load the model's dict
    via :func:`load_charset`."""
    return tuple(chr(c) for c in range(33, 127))

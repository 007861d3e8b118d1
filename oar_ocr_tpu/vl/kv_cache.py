"""Trimmable KV cache: preallocated buckets, append, rollback, reorder.

Re-expresses oar-ocr-vl/src/kv_trim.rs:20-50 — the fixed-capacity KV cache
backing every VLM: append via slice writes, speculative rollback via
``trim_to`` (a length counter here — buffers are never shrunk), and
``keep_indices`` gather for branch reordering — plus the power-of-two
capacity bucketing of decoder_graph.rs:14-24 (PADDLE_DECODE_CACHE_LEN
16384): each bucket is one compiled program, replacing CUDA-graph capture
with XLA's executable cache (SURVEY §2.5 "Decoder CUDA graphs").

Functional style: the cache is an immutable pytree; every operation
returns a new cache. Under jit with donated buffers the updates are
in-place on device.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config.runtime import pow2_buckets

KV_CAPACITY_BUCKETS = pow2_buckets(256, 16384)


def decoder_cache_capacity(prompt_len: int, max_new_tokens: int,
                           cap: int = 16384) -> int:
    """next-power-of-two(prompt + max_new), capped
    (decoder_graph.rs:14 decoder_cache_capacity)."""
    need = prompt_len + max_new_tokens
    c = 256
    while c < need and c < cap:
        c *= 2
    return min(c, cap)


class KVCache(NamedTuple):
    """Per-layer stacked KV: k/v (L, B, H_kv, C, D); length (B,) int32;
    pad (B,) int32 — the number of left-padding slots written during a
    left-padded prefill. Decode masks exclude slots < pad[b] so rows with
    shorter prompts never attend the K/V written for pad tokens
    (attention.rs:660-692 masks pos < pad_len per row)."""

    k: jax.Array
    v: jax.Array
    length: jax.Array
    pad: jax.Array = None

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @staticmethod
    def create(layers: int, batch: int, heads: int, capacity: int,
               head_dim: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (layers, batch, heads, capacity, head_dim)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                       jnp.zeros((batch,), jnp.int32),
                       jnp.zeros((batch,), jnp.int32))

    def with_pad(self, pad_lens: jax.Array) -> "KVCache":
        """Record per-row left-pad slot counts (set once after a
        left-padded prefill; carried through every subsequent op)."""
        return self._replace(pad=jnp.asarray(pad_lens, jnp.int32))

    def append(self, layer: int, k_new: jax.Array, v_new: jax.Array,
               pos: jax.Array) -> "KVCache":
        """Write (B, H, T_new, D) at position ``pos`` in layer ``layer``.
        ``pos`` is a scalar int32, or a (B,) vector for continuous
        batching where every row sits at its own KV length (the
        reference's per-branch caches, hpd_parsing/model.rs:585-603).
        Length is advanced separately by `advance` (append per layer,
        advance once per step)."""

        pos = jnp.asarray(pos)
        if pos.ndim == 0:
            k = self.k.at[layer].set(jax.lax.dynamic_update_slice(
                self.k[layer], k_new.astype(self.k.dtype), (0, 0, pos, 0)))
            v = self.v.at[layer].set(jax.lax.dynamic_update_slice(
                self.v[layer], v_new.astype(self.v.dtype), (0, 0, pos, 0)))
            return self._replace(k=k, v=v)

        def write(buf_row, new_row, p):
            return jax.lax.dynamic_update_slice(buf_row, new_row, (0, p, 0))

        k = self.k.at[layer].set(jax.vmap(write)(
            self.k[layer], k_new.astype(self.k.dtype), pos))
        v = self.v.at[layer].set(jax.vmap(write)(
            self.v[layer], v_new.astype(self.v.dtype), pos))
        return self._replace(k=k, v=v)

    def advance(self, n: int | jax.Array) -> "KVCache":
        return self._replace(length=self.length + n)

    def trim_to(self, new_length: jax.Array) -> "KVCache":
        """Speculative rollback (kv_trim.rs trim_to): stale slots beyond
        the restored length are masked out by the generation mask, so a
        pure length reset is sufficient."""
        return self._replace(
            length=jnp.broadcast_to(jnp.asarray(new_length, jnp.int32),
                                    self.length.shape))

    def with_lengths(self, lengths: jax.Array) -> "KVCache":
        """Set per-row lengths (continuous batching: each branch accepts
        a different number of speculative tokens per round)."""
        return self._replace(length=jnp.asarray(lengths, jnp.int32))

    def copy_row(self, src: int, dst: int, new_length) -> "KVCache":
        """Clone one batch row's K/V into another row with a (possibly
        shorter) logical length — the branch-fork primitive
        (SdarKvCache.fork_at, mineru_diffusion/text.rs:42-113; the
        reference shares tensor views, the TPU analog is an HBM row copy
        with slots beyond ``new_length`` masked by the per-row mask)."""
        k = self.k.at[:, dst].set(self.k[:, src])
        v = self.v.at[:, dst].set(self.v[:, src])
        length = self.length.at[dst].set(jnp.int32(new_length))
        pad = self.pad
        if pad is not None:
            pad = pad.at[dst].set(pad[src])
        return KVCache(k, v, length, pad)

    def pad_batch(self, new_batch: int) -> "KVCache":
        """Grow the batch dimension to ``new_batch`` rows (zero-filled,
        zero-length) — slot-pool growth for continuous batching."""
        b = self.k.shape[1]
        if new_batch <= b:
            return self
        extra = new_batch - b
        padding = [(0, 0), (0, extra), (0, 0), (0, 0), (0, 0)]
        k = jnp.pad(self.k, padding)
        v = jnp.pad(self.v, padding)
        length = jnp.pad(self.length, (0, extra))
        pad = None if self.pad is None else jnp.pad(self.pad, (0, extra))
        return KVCache(k, v, length, pad)

    def keep_indices(self, indices: jax.Array) -> "KVCache":
        """Gather batch entries (branch reordering / continuation —
        kv_trim.rs keep_indices)."""
        pad = None if self.pad is None else self.pad[indices]
        return KVCache(self.k[:, indices], self.v[:, indices],
                       self.length[indices], pad)

    def layer(self, i: int) -> Tuple[jax.Array, jax.Array]:
        return self.k[i], self.v[i]

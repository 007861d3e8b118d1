"""Paged KV cache — TPU bucketed-page emulation of dynamic_kv.cu.

The reference's HunyuanOCR decode path appends K/V into a paged pool and
attends with `flash_attn_varlen_paged_windowed`
(oar-ocr-vl/src/hunyuanocr/dynamic_kv.cu:61, dflash.rs:618-640). The CUDA
property that matters is that attention cost and append cost scale with
*pages in use*, not preallocated capacity, and growth never reallocates
the whole cache.

On TPU, XLA needs static shapes, so the faithful re-expression is
page-granular bucketing: storage is a page pool laid out sequentially per
sequence (pages are private to a sequence — the reference's block_table is
likewise a per-sequence arange, dflash.rs ContextKv); ``append`` writes
only the touched pages via dynamic_update_slice, and ``view(n_pages)``
exposes a contiguous K/V prefix so the attention program is compiled per
page-count bucket (one executable per bucket, the same jit-per-bucket
discipline as kv_cache.KV_CAPACITY_BUCKETS). Compute therefore scales with
ceil(len / page_size), not capacity — the paged-KV property — while
staying XLA-friendly.

Functional pytree like KVCache: every op returns a new cache; under jit
with donation the writes are in-place.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PagedKVCache(NamedTuple):
    """k/v: (L, B, n_pages, page_size, H_kv, D); length: (B,) int32;
    pad: (B,) int32 — rows < pad[b] are left-padding, masked by readers
    (same convention as kv_cache.KVCache.pad)."""

    k: jax.Array
    v: jax.Array
    length: jax.Array
    pad: jax.Array = None

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k.shape[2]

    @property
    def capacity(self) -> int:
        return self.num_pages * self.page_size

    @staticmethod
    def create(layers: int, batch: int, heads: int, num_pages: int,
               page_size: int, head_dim: int, dtype=jnp.bfloat16
               ) -> "PagedKVCache":
        shape = (layers, batch, num_pages, page_size, heads, head_dim)
        return PagedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                            jnp.zeros((batch,), jnp.int32),
                            jnp.zeros((batch,), jnp.int32))

    def pages_used(self) -> jax.Array:
        """(B,) number of pages holding live rows."""
        ps = self.page_size
        return (self.length + ps - 1) // ps

    def append(self, layer: int, k: jax.Array, v: jax.Array,
               start: jax.Array) -> "PagedKVCache":
        """Write (B, H, T, D) rows at positions [start, start+T) (same
        ``start`` for every batch row — the paged analog of KVCache.append).

        The write touches only the pages that overlap the row range: the
        (B, H, T, D) block is scattered with one dynamic_update_slice into
        a T-row window of the flattened pool (rows are page-contiguous, so
        a window update IS a page update)."""

        L, B, P, S, H, D = self.k.shape
        t = k.shape[2]
        rows_k = jnp.transpose(k, (0, 2, 1, 3))       # (B, T, H, D)
        rows_v = jnp.transpose(v, (0, 2, 1, 3))
        flat_k = self.k.reshape(L, B, P * S, H, D)
        flat_v = self.v.reshape(L, B, P * S, H, D)
        start = jnp.asarray(start, jnp.int32)
        lk = jax.lax.dynamic_update_slice(
            flat_k[layer], rows_k.astype(self.k.dtype),
            (jnp.int32(0), start, jnp.int32(0), jnp.int32(0)))
        lv = jax.lax.dynamic_update_slice(
            flat_v[layer], rows_v.astype(self.v.dtype),
            (jnp.int32(0), start, jnp.int32(0), jnp.int32(0)))
        new_k = self.k.at[layer].set(lk.reshape(B, P, S, H, D))
        new_v = self.v.at[layer].set(lv.reshape(B, P, S, H, D))
        return self._replace(k=new_k, v=new_v)

    def advance(self, n) -> "PagedKVCache":
        return self._replace(length=self.length + jnp.asarray(n, jnp.int32))

    def trim_to(self, new_length) -> "PagedKVCache":
        """Speculative rollback: drop rows beyond ``new_length`` (pages are
        never freed — a length reset, kv_trim.rs semantics)."""
        nl = jnp.broadcast_to(jnp.asarray(new_length, jnp.int32),
                              self.length.shape)
        return self._replace(length=nl)

    def view(self, n_pages: int, layer: int
             ) -> Tuple[jax.Array, jax.Array]:
        """Contiguous (B, H, n_pages·S, D) K/V over the first ``n_pages``
        pages — the per-bucket attention operand. ``n_pages`` must be a
        static Python int (bucket key)."""
        L, B, P, S, H, D = self.k.shape
        k = self.k[layer, :, :n_pages].reshape(B, n_pages * S, H, D)
        v = self.v[layer, :, :n_pages].reshape(B, n_pages * S, H, D)
        return (jnp.transpose(k, (0, 2, 1, 3)),
                jnp.transpose(v, (0, 2, 1, 3)))


def page_bucket(length: int, page_size: int, num_pages: int) -> int:
    """Static page-count bucket for a host-known length (next power of two
    pages, clamped) — one compiled attention program per bucket."""
    need = max(1, -(-length // page_size))
    b = 1
    while b < need:
        b *= 2
    return min(b, num_pages)

"""DFlash block-draft model for HunyuanOCR (the real architecture).

Re-expresses oar-ocr-vl/src/hunyuanocr/dflash.rs (VERDICT r1 #4): the
draft is a small transformer whose **context K/V is projected from the
TARGET decoder's mid-layer hidden states**, not from its own token
forward:

- the target records hidden states after the layers named by
  ``target_layer_ids`` (0-based layer indices; llm.rs:1082-1122 takes
  them +1 as its 1-based post-layer aux taps and errors on
  out-of-range ids), concatenated along the hidden axis;
- ``fc`` (Linear, no bias) + ``hidden_norm`` (RMSNorm) map that concat to
  the draft width (dflash.rs transform_target:1040-1049);
- each draft layer's own k/v projections turn the transformed target rows
  into context K/V, rotated at the absolute context positions and appended
  incrementally as the target commits tokens (append_projected_context);
- a draft query block = [bonus-token embed, mask-token embed ×
  (block_size−1)] (embeddings from the TARGET's table) runs through the
  draft layers attending to [context ‖ block] **non-causally** — all mask
  positions predicted in one pass (dflash.rs:1-7);
- rows 1.. project through the TARGET's LM head; argmax = proposals
  (proposals_from_hidden:1166-1181), then one causal target pass verifies
  (vl/speculative.verify_draft).

Layer architecture (dflash.rs DFlashLayer:729, DFlashAttention:348,
DFlashMlp:672): input_layernorm → GQA attention with per-head-dim
q_norm/k_norm RMSNorms and RoPE → post_attention_layernorm → SwiGLU MLP,
all projections bias-free. Module names mirror the checkpoint tree
(layers.{i}.self_attn.q_proj …) so runtime/ppocr_maps.hf_vl_name converts
the published safetensors directly.

The context cache is the paged pool of vl/paged_kv.py — the TPU analog of
dynamic_kv.cu's paged append + varlen attention.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .paddleocr_vl import RMSNorm
from .paged_kv import PagedKVCache


@dataclass(frozen=True)
class DFlashConfig:
    """dflash/config.json fields (dflash.rs:43-59)."""

    block_size: int = 8
    hidden: int = 2048
    intermediate: int = 6144
    heads: int = 16
    kv_heads: int = 4
    head_dim: int = 128
    layers: int = 1
    vocab_size: int = 128000
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0
    # 0-BASED target layer indices whose post-layer hiddens feed ``fc``
    # — the checkpoint convention: llm.rs converts with ``id + 1`` into
    # its 1-based aux taps and ERRORS on ids >= num_hidden_layers
    # (model.rs:489-501), never filters. dflash.rs:1422 ships
    # [1, 8, 15, 22] for the published checkpoint, which therefore
    # requires a >=23-layer target (the 24-layer HunyuanOCR decoder).
    target_layer_ids: Tuple[int, ...] = (1, 8, 15, 22)
    mask_token_id: int = 120817
    page_size: int = 128
    max_pages: int = 32

    def tiny(self, **overrides) -> "DFlashConfig":
        base = dataclasses.replace(
            self, block_size=4, hidden=64, intermediate=128, heads=4,
            kv_heads=2, head_dim=16, layers=1, vocab_size=256,
            target_layer_ids=(0, 1), mask_token_id=255, page_size=16,
            max_pages=64)
        return dataclasses.replace(base, **overrides)


def _rope(x: jnp.ndarray, pos: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Standard RoPE on (B, H, T, D); pos (T,) absolute positions (the
    draft's rotary uses a single position axis, dflash.rs rope:1025)."""
    d = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = pos.astype(jnp.float32)[:, None] * inv[None]      # (T, D/2)
    cos = jnp.cos(freqs)[None, None]
    sin = jnp.sin(freqs)[None, None]
    x1, x2 = x[..., ::2].astype(jnp.float32), x[..., 1::2].astype(jnp.float32)
    out = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)
    return out.reshape(x.shape).astype(x.dtype)


class DFlashAttention(nn.Module):
    cfg: DFlashConfig

    def setup(self):
        c = self.cfg
        self.q_proj = nn.Dense(c.heads * c.head_dim, use_bias=False,
                               name="q_proj")
        self.k_proj = nn.Dense(c.kv_heads * c.head_dim, use_bias=False,
                               name="k_proj")
        self.v_proj = nn.Dense(c.kv_heads * c.head_dim, use_bias=False,
                               name="v_proj")
        self.o_proj = nn.Dense(c.hidden, use_bias=False, name="o_proj")
        self.q_norm = RMSNorm(name="q_norm")
        self.k_norm = RMSNorm(name="k_norm")

    def context_kv(self, target_rows: jnp.ndarray, start: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Transformed target rows (B, T, hidden) → rotated context K and
        raw V, (B, H_kv, T, D) each, at absolute positions start..start+T."""
        c = self.cfg
        b, t, _ = target_rows.shape
        k = self.k_proj(target_rows).reshape(b, t, c.kv_heads, c.head_dim)
        v = self.v_proj(target_rows).reshape(b, t, c.kv_heads, c.head_dim)
        k = self.k_norm(k).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        pos = start + jnp.arange(t)
        return _rope(k, pos, c.rope_theta), v

    def __call__(self, x, ctx_k, ctx_v, ctx_len, start, ctx_pad=None):
        """Non-causal block attention over [context ‖ block]. ctx_k/ctx_v:
        (B, H_kv, C, D) from the paged view (C = bucket rows ≥ ctx_len);
        rows ≥ ctx_len and left-pad rows < ctx_pad are masked out."""
        c = self.cfg
        b, t, _ = x.shape
        g = c.heads // c.kv_heads
        q = self.q_proj(x).reshape(b, t, c.heads, c.head_dim)
        k = self.k_proj(x).reshape(b, t, c.kv_heads, c.head_dim)
        v = self.v_proj(x).reshape(b, t, c.kv_heads, c.head_dim)
        q = self.q_norm(q).transpose(0, 2, 1, 3)
        k = self.k_norm(k).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        pos = start + jnp.arange(t)
        q = _rope(q, pos, c.rope_theta)
        k = _rope(k, pos, c.rope_theta)

        full_k = jnp.concatenate([ctx_k, k], axis=2)      # (B, Hkv, C+T, D)
        full_v = jnp.concatenate([ctx_v, v], axis=2)
        cap = ctx_k.shape[2]
        col = jnp.arange(cap + t)[None, None, None, :]
        mask = (col < ctx_len[:, None, None, None]) | (col >= cap)
        if ctx_pad is not None:
            mask = mask & ((col >= ctx_pad[:, None, None, None])
                           | (col >= cap))

        fk = jnp.repeat(full_k, g, axis=1)
        fv = jnp.repeat(full_v, g, axis=1)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                          fk.astype(jnp.float32)) * (c.head_dim ** -0.5)
        attn = jnp.where(mask, attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, fv.astype(jnp.float32))
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c.heads * c.head_dim)
        return self.o_proj(o.astype(x.dtype))


class DFlashMlp(nn.Module):
    cfg: DFlashConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        gate = nn.Dense(c.intermediate, use_bias=False, name="gate_proj")(x)
        up = nn.Dense(c.intermediate, use_bias=False, name="up_proj")(x)
        return nn.Dense(c.hidden, use_bias=False,
                        name="down_proj")(jax.nn.silu(gate) * up)


class DFlashLayer(nn.Module):
    cfg: DFlashConfig

    def setup(self):
        self.input_layernorm = RMSNorm(name="input_layernorm")
        self.self_attn = DFlashAttention(self.cfg, name="self_attn")
        self.post_attention_layernorm = RMSNorm(
            name="post_attention_layernorm")
        self.mlp = DFlashMlp(self.cfg, name="mlp")

    def __call__(self, x, ctx_k, ctx_v, ctx_len, start, ctx_pad=None):
        h = self.input_layernorm(x)
        x = x + self.self_attn(h, ctx_k, ctx_v, ctx_len, start, ctx_pad)
        h = self.post_attention_layernorm(x)
        return x + self.mlp(h)


class DFlashDraft(nn.Module):
    """fc + hidden_norm + layers + final norm (checkpoint tree names)."""

    cfg: DFlashConfig

    def setup(self):
        c = self.cfg
        self.fc = nn.Dense(c.hidden, use_bias=False, name="fc")
        self.hidden_norm = RMSNorm(name="hidden_norm")
        self.layers = [DFlashLayer(c, name=f"layers.{i}")
                       for i in range(c.layers)]
        self.norm = RMSNorm(name="norm")

    def transform_target(self, aux_hidden: jnp.ndarray) -> jnp.ndarray:
        """(B, T, hidden·|ids|) target concat → (B, T, hidden)."""
        return self.hidden_norm(self.fc(aux_hidden))

    def context_rows(self, aux_hidden: jnp.ndarray, start
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project aux target hiddens into per-layer context K/V, stacked
        (L, B, H_kv, T, D) — written into the paged cache by the caller."""
        t = self.transform_target(aux_hidden)
        ks, vs = [], []
        start = jnp.asarray(start, jnp.int32)
        for layer in self.layers:
            k, v = layer.self_attn.context_kv(t, start)
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks), jnp.stack(vs)

    def draft_hidden(self, query_embeds: jnp.ndarray, cache: PagedKVCache,
                     n_pages: int, start) -> jnp.ndarray:
        """Run the bonus+mask query block; returns normed hidden
        (B, block, hidden). ``n_pages`` is the static page bucket."""
        x = query_embeds
        start = jnp.asarray(start, jnp.int32)
        for li, layer in enumerate(self.layers):
            ck, cv = cache.view(n_pages, li)
            x = layer(x, ck.astype(x.dtype), cv.astype(x.dtype),
                      cache.length, start, cache.pad)
        return self.norm(x)

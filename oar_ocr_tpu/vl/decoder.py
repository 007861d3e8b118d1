"""Shared causal-LM decoder core for all VLM families.

The reference gives each of its 8 VLM families a hand-written decoder
(ernie.rs, hunyuanocr/llm.rs, glmocr/text.rs, mineru/text.rs, ovisocr2/
text.rs, …) over one shared attention module (attention.rs). Here the
shared piece is larger: one configurable `CausalLM` flax module covers the
LLaMA-family design space the families span —

- rotary kind: standard RoPE, 3-D multimodal MRoPE (Ernie/Qwen2-VL), or
  XDRoPE (HunYuanVL — per-axis rotary over designated head groups);
- GQA head layout, SwiGLU MLP, RMSNorm;
- per-layer kind: full attention (KV-cached) or gated-delta linear
  attention (OvisOCR2's hybrid, O(1) state);

with `prefill` / `decode_step` methods over the shared KVCache. Families
then consist of a config, a vision tower, their processing rules, and
their *distinctive decode mechanism* (speculation, diffusion, forking).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import (apply_rope, create_generation_mask, mrope_cos_sin, scaled_dot_product_attention)
from .gated_delta import gated_delta_rule
from .kv_cache import KVCache
from .paddleocr_vl import RMSNorm, SwiGLU


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32000
    hidden: int = 1024
    layers: int = 16
    heads: int = 16
    kv_heads: int = 4
    ffn: int = 3072
    rope_theta: float = 10000.0
    rope_kind: str = "rope"                      # rope | mrope | xdrope
    mrope_sections: Tuple[int, ...] = (16, 8, 8)
    # xdrope: fraction of head_dim pairs driven by each spatial axis
    xdrope_sections: Tuple[int, ...] = (24, 4, 4)
    # layer kinds, cycled over depth: "attn" or "delta"
    layer_pattern: Tuple[str, ...] = ("attn",)
    eos_id: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    def kind(self, layer: int) -> str:
        return self.layer_pattern[layer % len(self.layer_pattern)]

    def tiny(self, **overrides) -> "DecoderConfig":
        base = dataclasses.replace(
            self, vocab_size=256, hidden=64, layers=2, heads=4, kv_heads=2,
            ffn=128, mrope_sections=(4, 2, 2), xdrope_sections=(4, 2, 2))
        return dataclasses.replace(base, **overrides)


def _rope_tables(cfg: DecoderConfig, position_ids: jax.Array):
    """position_ids: (3, B, T) for mrope/xdrope, (B, T) for rope →
    cos/sin (B, T, head_dim/2)."""

    if cfg.rope_kind == "mrope":
        return mrope_cos_sin(position_ids, cfg.head_dim,
                             cfg.mrope_sections, cfg.rope_theta)
    if cfg.rope_kind == "xdrope":
        # XDRoPE: like MRoPE but the axis partition applies to contiguous
        # frequency bands sized by xdrope_sections (hunyuanocr llm.rs)
        return mrope_cos_sin(position_ids, cfg.head_dim,
                             cfg.xdrope_sections, cfg.rope_theta)
    # standard: same positions for all pairs
    pos = position_ids if position_ids.ndim == 2 else position_ids[0]
    inv = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim))
    freqs = pos[..., None].astype(jnp.float32) * inv
    return jnp.cos(freqs), jnp.sin(freqs)


class AttnLayer(nn.Module):
    cfg: DecoderConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, cos, sin, cache: KVCache, pos, mask, dstate,
                 pad_mask=None):
        c = self.cfg
        hd = c.head_dim
        b, t, _ = x.shape
        h = RMSNorm(name="input_norm")(x)
        q = nn.Dense(c.heads * hd, use_bias=False, dtype=x.dtype, name="q")(h)
        k = nn.Dense(c.kv_heads * hd, use_bias=False, dtype=x.dtype, name="k")(h)
        v = nn.Dense(c.kv_heads * hd, use_bias=False, dtype=x.dtype, name="v")(h)
        q = q.reshape(b, t, c.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, c.kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, c.kv_heads, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos[:, None], sin[:, None])
        k = apply_rope(k, cos[:, None], sin[:, None])
        cache = cache.append(self.layer_idx, k, v, pos)
        ck, cv = cache.layer(self.layer_idx)
        o = scaled_dot_product_attention(q, ck, cv, mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c.heads * hd)
        x = x + nn.Dense(c.hidden, use_bias=False, dtype=x.dtype, name="o")(o)
        h = RMSNorm(name="post_norm")(x)
        x = x + SwiGLU(c.ffn)(h)
        return x, cache, dstate


class DeltaLayer(nn.Module):
    """Gated-delta linear-attention layer (OvisOCR2 hybrid; O(1) state —
    uses the KV cache's slot 0 as the flattened state store)."""

    cfg: DecoderConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, cos, sin, cache: KVCache, pos, mask, dstate,
                 pad_mask=None):
        c = self.cfg
        hd = c.head_dim
        b, t, _ = x.shape
        h = RMSNorm(name="input_norm")(x)
        q = nn.Dense(c.heads * hd, use_bias=False, dtype=x.dtype, name="q")(h)
        k = nn.Dense(c.heads * hd, use_bias=False, dtype=x.dtype, name="k")(h)
        v = nn.Dense(c.heads * hd, use_bias=False, dtype=x.dtype, name="v")(h)
        g = nn.Dense(2 * c.heads, dtype=x.dtype, name="gates")(h)
        alpha = jax.nn.sigmoid(g[..., : c.heads].astype(jnp.float32))
        beta = jax.nn.sigmoid(g[..., c.heads :].astype(jnp.float32))
        if pad_mask is not None:
            # LEFT-pad rows must not fold into the recurrent state
            # (llm_decoders.GatedDeltaNetLayer rationale): β=0 removes
            # the update, α=1 removes the decay — S carries through
            # bit-exactly in both sequential and chunked forms
            beta = beta * pad_mask[:, :, None].astype(beta.dtype)
            alpha = jnp.where(pad_mask[:, :, None], alpha,
                              jnp.ones_like(alpha))

        def heads(y):
            return y.reshape(b, t, c.heads, hd).transpose(0, 2, 1, 3)

        # persistent recurrent state: slice `layer_idx` of the carried
        # (L, B, H, Dk, Dv) delta-state tensor (the linear-attention
        # analog of the KV cache — O(1) per step)
        import os as _os

        from .gated_delta import gated_delta_rule_chunked

        rule = (gated_delta_rule
                if t <= 1 or _os.environ.get("OAR_TPU_NO_CHUNKED_DELTA")
                else gated_delta_rule_chunked)
        o, s_final = rule(
            heads(q), heads(k), heads(v),
            alpha.transpose(0, 2, 1), beta.transpose(0, 2, 1),
            initial_state=dstate[self.layer_idx], return_state=True)
        dstate = dstate.at[self.layer_idx].set(s_final)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c.heads * hd)
        x = x + nn.Dense(c.hidden, use_bias=False, dtype=x.dtype,
                         name="o")(o.astype(x.dtype))
        h = RMSNorm(name="post_norm")(x)
        x = x + SwiGLU(c.ffn)(h)
        return x, cache, dstate


class CausalLM(nn.Module):
    """Decoder trunk + lm head over fused embeddings."""

    cfg: DecoderConfig

    def setup(self):
        c = self.cfg
        self.tok_emb = nn.Embed(c.vocab_size, c.hidden)
        self.lm_head = nn.Dense(c.vocab_size, use_bias=False)
        layers = []
        for li in range(c.layers):
            cls = AttnLayer if c.kind(li) == "attn" else DeltaLayer
            layers.append(cls(c, li, name=f"layer{li}"))
        self.decoder_layers = layers
        self.final_norm = RMSNorm(name="final_norm")

    def embed_tokens(self, ids):
        return self.tok_emb(ids)

    def empty_delta_state(self, batch: int) -> jnp.ndarray:
        c = self.cfg
        return jnp.zeros((c.layers, batch, c.heads, c.head_dim,
                          c.head_dim), jnp.float32)

    def trunk(self, embeds, position_ids, cache, pos, mask, dstate=None,
              aux_layers: Tuple[int, ...] = (), pad_mask=None):
        """``aux_layers``: 1-based layer ids whose POST-layer hidden states
        are concatenated along the hidden axis and returned as the fourth
        output — the DFlash target-feature tap (hunyuanocr llm.rs:1108-1122
        records hidden_states after layer index+1 and cats on dim 2).
        ``pad_mask`` (B, T) bool, True = real: neutralizes LEFT-pad rows
        in the delta layers' recurrent fold (prefill only)."""
        cos, sin = _rope_tables(self.cfg, position_ids)
        cos = cos.astype(embeds.dtype)
        sin = sin.astype(embeds.dtype)
        if dstate is None:
            dstate = self.empty_delta_state(embeds.shape[0])
        x = embeds
        aux = []
        for li, layer in enumerate(self.decoder_layers):
            x, cache, dstate = layer(x, cos, sin, cache, pos, mask, dstate,
                                     pad_mask)
            if (li + 1) in aux_layers:
                aux.append(x)
        out = self.final_norm(x)
        if aux_layers:
            return out, cache, dstate, jnp.concatenate(aux, axis=-1)
        return out, cache, dstate

    def prefill(self, embeds, position_ids, cache, mask, dstate=None,
                pad_mask=None):
        hidden, cache, dstate = self.trunk(embeds, position_ids, cache,
                                           jnp.int32(0), mask, dstate,
                                           pad_mask=pad_mask)
        return (self.lm_head(hidden[:, -1]).astype(jnp.float32), hidden,
                cache, dstate)

    def decode_step(self, tok_ids, position_ids, cache, pos,
                    dstate=None):
        embeds = self.tok_emb(tok_ids)[:, None, :]
        mask = create_generation_mask(cache.length + 1, cache.capacity,
                                      cache.pad)
        hidden, cache, dstate = self.trunk(embeds, position_ids, cache, pos,
                                           mask, dstate)
        cache = cache.advance(1)
        return (self.lm_head(hidden[:, -1]).astype(jnp.float32), hidden,
                cache, dstate)

    def decode_block_bidir(self, tok_ids, position_ids, cache, pos):
        """Non-causal pass over a (B, T) block: every block position
        attends to the committed prefix AND the whole block — the SDAR
        diffusion predictor's view (mineru_diffusion/model.rs: masked
        positions predicted in parallel, bidirectional within the block).
        The returned cache is DISCARDED by diffusion trials and kept only
        on the final commit pass."""

        b, t = tok_ids.shape
        embeds = self.tok_emb(tok_ids)
        cap = cache.capacity
        cap_pos = jnp.arange(cap)[None, None, None, :]
        limit = cache.length[:, None, None, None] + t
        mask = cap_pos < limit
        if cache.pad is not None:
            mask = mask & (cap_pos >= cache.pad[:, None, None, None])
        mask = jnp.broadcast_to(mask, (b, 1, t, cap))
        hidden, cache, _ = self.trunk(embeds, position_ids, cache, pos, mask)
        cache = cache.advance(t)
        return self.lm_head(hidden).astype(jnp.float32), hidden, cache

    def decode_block(self, tok_ids, position_ids, cache, pos):
        """Causal pass over a (B, T) block appended at cache position
        ``pos`` — the speculative verification pass (one target forward
        over [last_committed, draft…], glmocr text.rs:1198 / hunyuan
        dflash verify). Returns logits for every block position."""

        b, t = tok_ids.shape
        embeds = self.tok_emb(tok_ids)
        cap = cache.capacity
        cap_pos = jnp.arange(cap)[None, None, None, :]
        q_pos = jnp.arange(t)[None, None, :, None]
        limit = cache.length[:, None, None, None] + q_pos + 1
        mask = cap_pos < limit
        if cache.pad is not None:
            mask = mask & (cap_pos >= cache.pad[:, None, None, None])
        hidden, cache, _ = self.trunk(embeds, position_ids, cache, pos, mask)
        cache = cache.advance(t)
        return self.lm_head(hidden).astype(jnp.float32), hidden, cache

    def logits_for(self, hidden):
        return self.lm_head(hidden).astype(jnp.float32)

    # ----------------- DFlash aux-capturing variants -----------------

    def prefill_aux(self, embeds, position_ids, cache, mask,
                    aux_layers: Tuple[int, ...]):
        """prefill + the concatenated mid-layer hidden states the DFlash
        draft consumes as context (dflash.rs reset_context)."""
        hidden, cache, _, aux = self.trunk(
            embeds, position_ids, cache, jnp.int32(0), mask,
            aux_layers=aux_layers)
        return (self.lm_head(hidden[:, -1]).astype(jnp.float32), hidden,
                cache, aux)

    def decode_block_aux(self, tok_ids, position_ids, cache, pos,
                         aux_layers: Tuple[int, ...]):
        """Causal verify block + aux hiddens for the accepted rows
        (dflash.rs append_context feeds them back into the draft)."""
        b, t = tok_ids.shape
        embeds = self.tok_emb(tok_ids)
        cap = cache.capacity
        cap_pos = jnp.arange(cap)[None, None, None, :]
        q_pos = jnp.arange(t)[None, None, :, None]
        limit = cache.length[:, None, None, None] + q_pos + 1
        mask = cap_pos < limit
        if cache.pad is not None:
            mask = mask & (cap_pos >= cache.pad[:, None, None, None])
        hidden, cache, _, aux = self.trunk(embeds, position_ids, cache,
                                           pos, mask, aux_layers=aux_layers)
        cache = cache.advance(t)
        return self.lm_head(hidden).astype(jnp.float32), hidden, cache, aux

"""PaddleOCR-VL (0.9B): NaViT-style vision encoder + Ernie AR decoder.

Re-expresses oar-ocr-vl/src/paddleocr_vl/ — vision.rs (NaViT windowed/
chunked attention), ernie.rs (Ernie4.5 decoder with 3-D MRoPE,
apply_multimodal_rotary_pos_emb :26), projector.rs, model.rs (task
prompts :20-53, batched left-padded prefill + per-step decode :247-530,
greedy argmax :525) — as explicit flax modules.

TPU-first decode: prefill is one jitted program per (batch, prompt-bucket,
KV-bucket); the decode loop is a `lax.scan` of a single fused step
(embed → L×(RMSNorm→GQA attn over the KV bucket→SwiGLU) → lm_head →
argmax) carried entirely on device — per-bucket jit replaces CUDA-graph
capture (decoder_graph.rs), and no tensor leaves the device until the id
buffer returns at the end.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import (apply_rope, create_generation_mask, mrope_cos_sin, scaled_dot_product_attention)
from .kv_cache import KVCache

# Task prompts (paddleocr_vl/model.rs:30-38).
TASK_PROMPTS = {
    "ocr": "OCR:",
    "table": "Table Recognition:",
    "formula": "Formula Recognition:",
    "chart": "Chart Recognition:",
    "spotting": "Text Spotting:",
    "seal": "Seal Recognition:",
}


@dataclass(frozen=True)
class PaddleOCRVLConfig:
    # decoder (Ernie4.5-0.3B class)
    vocab_size: int = 103424
    hidden: int = 1024
    layers: int = 18
    heads: int = 16
    kv_heads: int = 2
    ffn: int = 3072
    rope_theta: float = 500000.0
    mrope_sections: Tuple[int, int, int] = (16, 8, 8)  # t/h/w pairs, sums to head_dim/2
    # vision (NaViT/SigLIP class)
    v_dim: int = 1152
    v_layers: int = 27
    v_heads: int = 16
    v_patch: int = 14
    v_merge: int = 2
    # special tokens
    image_start_id: int = 101
    image_end_id: int = 102
    image_pad_id: int = 100
    eos_id: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    def tiny(self) -> "PaddleOCRVLConfig":
        """Development-size clone (same topology, small dims)."""
        return dataclasses.replace(
            self, vocab_size=512, hidden=128, layers=2, heads=4, kv_heads=2,
            ffn=256, v_dim=64, v_layers=2, v_heads=4,
            mrope_sections=(8, 4, 4))


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class SwiGLU(nn.Module):
    ffn: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        gate = nn.Dense(self.ffn, use_bias=False, dtype=x.dtype, name="gate")(x)
        up = nn.Dense(self.ffn, use_bias=False, dtype=x.dtype, name="up")(x)
        return nn.Dense(d, use_bias=False, dtype=x.dtype, name="down")(
            jax.nn.silu(gate) * up)


# ----------------------------- vision -----------------------------

class VisionBlock(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x, mask, valid_len=None):
        import os

        d = x.shape[-1]
        h = nn.LayerNorm(dtype=x.dtype)(x)
        b, t, _ = h.shape
        hd = d // self.heads
        qkv = nn.Dense(3 * d, dtype=x.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, -1)
        shp = (b, t, self.heads, hd)
        q = q.reshape(shp).transpose(0, 2, 1, 3)
        k = k.reshape(shp).transpose(0, 2, 1, 3)
        v = v.reshape(shp).transpose(0, 2, 1, 3)
        if valid_len is not None and os.environ.get("OAR_TPU_FLASH_VISION"):
            # blockwise flash attention: avoids the (T, T) score tensor for
            # long vision sequences (ops/flash_attention.py)
            from ..ops.flash_attention import flash_attention

            o = flash_attention(q, k, v, valid_len=valid_len)
        else:
            o = scaled_dot_product_attention(q, k, v, mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=x.dtype, name="proj")(o)
        h = nn.LayerNorm(dtype=x.dtype)(x)
        x = x + SwiGLU(d * 4)(h)
        return x


class VisionEncoder(nn.Module):
    """Patch embed + ViT stack over a padded token sequence with validity
    mask (the static-shape analog of NaViT variable resolution; the
    reference's chunked-attention fallback vision.rs:7-17 is unnecessary
    under XLA — one fused attention handles the full sequence)."""

    cfg: PaddleOCRVLConfig

    @nn.compact
    def __call__(self, patches, valid):
        # patches: (B, T, patch*patch*3); valid: (B, T) bool
        c = self.cfg
        x = nn.Dense(c.v_dim, dtype=patches.dtype, name="patch_embed")(patches)
        mask = valid[:, None, None, :]
        vlen = jnp.sum(valid.astype(jnp.int32), -1)
        for _ in range(c.v_layers):
            x = VisionBlock(c.v_heads)(x, mask, vlen)
        return nn.LayerNorm(dtype=x.dtype)(x)


class Projector(nn.Module):
    """2×2 token merge + MLP to decoder hidden (projector.rs)."""

    cfg: PaddleOCRVLConfig

    @nn.compact
    def __call__(self, x):
        # x: (B, T, v_dim) with T divisible by merge²; merge groups of 4
        c = self.cfg
        b, t, d = x.shape
        m2 = c.v_merge ** 2
        x = x.reshape(b, t // m2, m2 * d)
        x = nn.Dense(c.hidden * 2, dtype=x.dtype, name="fc1")(x)
        x = jax.nn.gelu(x)
        return nn.Dense(c.hidden, dtype=x.dtype, name="fc2")(x)


# ----------------------------- decoder -----------------------------

class ErnieLayer(nn.Module):
    cfg: PaddleOCRVLConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, cos, sin, cache: KVCache, pos, mask):
        """x (B, T, D); cos/sin (B, T, head_dim/2); writes this layer's KV
        at ``pos`` and attends over the cache."""
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
        x = x + nn.Dense(c.hidden, use_bias=False, dtype=x.dtype,
                         name="o")(o)
        h = RMSNorm(name="post_norm")(x)
        x = x + SwiGLU(c.ffn)(h)
        return x, cache


class ErnieDecoder(nn.Module):
    """Decoder trunk: embeds are supplied (text+image fused); returns
    hidden states and the updated cache."""

    cfg: PaddleOCRVLConfig

    @nn.compact
    def __call__(self, embeds, position_ids, cache: KVCache, pos, mask):
        c = self.cfg
        cos, sin = mrope_cos_sin(position_ids, c.head_dim, c.mrope_sections,
                                 c.rope_theta)
        cos = cos.astype(embeds.dtype)
        sin = sin.astype(embeds.dtype)
        x = embeds
        for li in range(c.layers):
            x, cache = ErnieLayer(c, li, name=f"layer{li}")(
                x, cos, sin, cache, pos, mask)
        return RMSNorm(name="final_norm")(x), cache


class PaddleOCRVLModule(nn.Module):
    """Bundled module exposing prefill / decode_step / encode_vision as
    flax methods (one param tree, three jitted entry points)."""

    cfg: PaddleOCRVLConfig

    def setup(self):
        c = self.cfg
        self.vision = VisionEncoder(c)
        self.projector = Projector(c)
        self.decoder = ErnieDecoder(c)
        self.tok_emb = nn.Embed(c.vocab_size, c.hidden)
        self.lm_head = nn.Dense(c.vocab_size, use_bias=False)

    def init_all(self, patches, valid, ids, position_ids):
        """Touch every submodule once so `init` creates the full tree."""
        c = self.cfg
        img = self.encode_vision(patches, valid)
        emb = self.tok_emb(ids)
        b, t = ids.shape
        cache = KVCache.create(c.layers, b, c.kv_heads, t, c.head_dim,
                               dtype=emb.dtype)
        mask = jnp.ones((b, 1, t, t), bool)
        logits, _ = self.prefill(emb, position_ids, cache, mask)
        return img, logits

    def encode_vision(self, patches, valid):
        return self.projector(self.vision(patches, valid))

    def embed_tokens(self, ids):
        return self.tok_emb(ids)

    def prefill(self, embeds, position_ids, cache, mask):
        hidden, cache = self.decoder(embeds, position_ids, cache,
                                     jnp.int32(0), mask)
        logits = self.lm_head(hidden[:, -1])
        return logits.astype(jnp.float32), cache

    def decode_step(self, tok_ids, position_ids, cache, pos):
        """One token per sequence: tok_ids (B,), positions (3, B, 1)."""
        embeds = self.tok_emb(tok_ids)[:, None, :]
        mask = create_generation_mask(cache.length + 1, cache.capacity,
                                      cache.pad)
        hidden, cache = self.decoder(embeds, position_ids, cache, pos, mask)
        cache = cache.advance(1)
        logits = self.lm_head(hidden[:, -1])
        return logits.astype(jnp.float32), cache

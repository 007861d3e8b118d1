"""Exact HunyuanOCR architecture (vision tower + XDRoPE decoder).

VERDICT r1 #3: the generic VisionTower/CausalLM in families.py cannot
accept the published checkpoint. This module is the deploy topology of
oar-ocr-vl/src/hunyuanocr/ with flax module names mirroring the HF
safetensors tree (``vit.…`` and ``model.…``, model.rs:428-429), so
runtime/ppocr_maps.hf_vl_name + build_hunyuan_map convert the checkpoint
tensors directly.

Vision (vision.rs):
- ``vit.embeddings``: patch_embedding Conv2d(3→v_dim, k=s=patch) — a Dense
  over HWC-flattened patches here — plus a learned position table of
  (max_image/patch)² + 1 rows whose patch part is bilinear-interpolated
  (align_corners=False) to the input grid on host (vision.rs:139-176);
- ``vit.layers.{i}``: LayerNorm(eps) → q/k/v/o (bias) full attention →
  LayerNorm → dense_h_to_4h/dense_4h_to_h MLP with EXACT erf gelu
  (vision.rs:411-430 documents tanh-gelu drift flipping attention sinks);
- ``vit.perceive``: before_rms → proj.0 Conv(stride=merge) → gelu_erf →
  proj.2 Conv → +newline column per merged row → flatten → mlp Linear →
  [image_begin ‖ tokens ‖ image_end] → after_rms over the FULL
  concatenation (vision.rs:700-724 — normalizing before the cat leaves
  the markers near zero and prefill diverges).

Decoder (llm.rs): model.layers.{i} with input_layernorm /
post_attention_layernorm RMSNorms, bias-free q/k/v/o + per-head-dim
query_layernorm/key_layernorm RMSNorms (use_qk_norm), XDRoPE (the
section-mix of attention.rs:906 select_rope_sections over
rope_scaling.xdrope_section — same math as mrope_cos_sin), SwiGLU MLP,
tied LM head (embed_tokens weights, llm.rs:909).

Dims default to the published checkpoint's config.json fields where the
reference pins them (4608 = merge²·v_dim assert at vision.rs:636; 1024
projector out at :712) and are otherwise config-driven — conversion reads
config.json.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .attention import (apply_rope, mrope_cos_sin,
                        scaled_dot_product_attention)
from .kv_cache import KVCache
from .paddleocr_vl import RMSNorm, SwiGLU


@dataclass(frozen=True)
class HunyuanOCRConfig:
    # text backbone (config.json top level)
    vocab_size: int = 120818
    hidden: int = 1024
    layers: int = 20
    heads: int = 16
    kv_heads: int = 4
    head_dim: int = 128
    ffn: int = 4096
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0
    use_qk_norm: bool = True
    xdrope_section: Tuple[int, ...] = (24, 20, 20)   # sums to head_dim/2
    # vision (config.json vision_config)
    v_dim: int = 1152
    v_ffn: int = 4304
    v_layers: int = 27
    v_heads: int = 16
    v_patch: int = 16
    v_merge: int = 2
    v_ln_eps: float = 1e-5
    v_max_image: int = 2048       # learned-position base grid (vision.rs:60)
    add_patchemb_bias: bool = True
    # token ids
    eos_id: int = 2
    image_token_id: int = 120816

    @property
    def v_grid(self) -> int:
        return self.v_max_image // self.v_patch

    @property
    def merged_dim(self) -> int:
        return self.v_merge ** 2 * self.v_dim      # 4608 assert, vision.rs

    def tiny(self) -> "HunyuanOCRConfig":
        return dataclasses.replace(
            self, vocab_size=512, hidden=64, layers=2, heads=4, kv_heads=2,
            head_dim=16, ffn=128, xdrope_section=(4, 2, 2), v_dim=32,
            v_ffn=64, v_layers=2, v_heads=4, v_patch=4, v_max_image=32)


# ------------------------------- vision -------------------------------

class HyVisionAttention(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        hd = d // self.heads

        def h(y, name):
            y = nn.Dense(d, dtype=x.dtype, name=name)(y)
            return y.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        q = h(x, "q_proj")
        k = h(x, "k_proj")
        v = h(x, "v_proj")
        o = scaled_dot_product_attention(q, k, v, None)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, dtype=x.dtype, name="o_proj")(o)


class HyVisionLayer(nn.Module):
    cfg: HunyuanOCRConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.v_ln_eps, dtype=x.dtype,
                         name="input_layernorm")(x)
        x = x + HyVisionAttention(c.v_heads, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=c.v_ln_eps, dtype=x.dtype,
                         name="post_attention_layernorm")(x)
        h = nn.Dense(c.v_ffn, dtype=x.dtype, name="mlp.dense_h_to_4h")(h)
        h = jax.nn.gelu(h, approximate=False)        # gelu_erf
        h = nn.Dense(c.v_dim, dtype=x.dtype, name="mlp.dense_4h_to_h")(h)
        return x + h


class HyVisionPerceive(nn.Module):
    """vision.rs VisionPerceive — merged-grid conv projector + markers."""

    cfg: HunyuanOCRConfig

    @nn.compact
    def __call__(self, tokens, grid_h: int, grid_w: int):
        c = self.cfg
        md = c.merged_dim
        x = RMSNorm(eps=c.v_ln_eps, name="before_rms")(tokens)
        x = x.reshape(1, grid_h, grid_w, c.v_dim)          # NHWC
        x = nn.Conv(md, (c.v_merge, c.v_merge),
                    strides=(c.v_merge, c.v_merge), padding="VALID",
                    dtype=x.dtype, name="proj.0")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(md, (1, 1), dtype=x.dtype, name="proj.2")(x)
        _, h2, w2, _ = x.shape
        newline = self.param("image_newline", nn.initializers.normal(0.02),
                             (md,))
        nl = jnp.broadcast_to(newline.astype(x.dtype), (1, h2, 1, md))
        x = jnp.concatenate([x, nl], axis=2)               # extra column
        x = x.reshape(h2 * (w2 + 1), md)
        x = nn.Dense(c.hidden, dtype=x.dtype, name="mlp")(x)
        begin = self.param("image_begin", nn.initializers.normal(0.02),
                           (c.hidden,))
        end = self.param("image_end", nn.initializers.normal(0.02),
                         (c.hidden,))
        cat = jnp.concatenate(
            [begin[None].astype(x.dtype), x, end[None].astype(x.dtype)], 0)
        return RMSNorm(eps=c.v_ln_eps, name="after_rms")(cat)


class HunyuanVisionModel(nn.Module):
    """One image per call (variable grids are host-bucketed): flattened
    patches (1, h·w, patch²·3) + host-interpolated position rows →
    (1 + h2·(w2+1) + 1, hidden) image token embeddings."""

    cfg: HunyuanOCRConfig

    @nn.compact
    def __call__(self, patches, pos_embed, grid_h: int, grid_w: int):
        c = self.cfg
        x = nn.Dense(c.v_dim, use_bias=c.add_patchemb_bias,
                     dtype=patches.dtype,
                     name="embeddings.patch_embedding")(patches)
        x = x + pos_embed.astype(x.dtype)[None]
        for i in range(c.v_layers):
            x = HyVisionLayer(c, name=f"layers.{i}")(x)
        return HyVisionPerceive(c, name="perceive")(x[0], grid_h, grid_w)


class HyPositionTable(nn.Module):
    """vit.embeddings.position_embedding — (grid²+1, v_dim) learned table;
    row 0 is the cls slot, rows 1.. are bilinear-interpolated on host
    (vision.rs interpolate_patch_pos)."""

    cfg: HunyuanOCRConfig

    @nn.compact
    def __call__(self):
        c = self.cfg
        return self.param("embedding", nn.initializers.normal(0.02),
                          (c.v_grid * c.v_grid + 1, c.v_dim))


def interpolate_positions(table: np.ndarray, grid: int, out_h: int,
                          out_w: int) -> np.ndarray:
    """Host bilinear (align_corners=False) over the (grid², D) patch rows
    → (out_h·out_w, D), float32 (vision.rs interpolate_patch_pos)."""
    d = table.shape[-1]
    src = table.reshape(grid, grid, d).astype(np.float32)
    ys = (np.arange(out_h) + 0.5) * grid / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * grid / out_w - 0.5
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    fy = ys - y0
    fx = xs - x0
    y0c = np.clip(y0, 0, grid - 1)
    y1c = np.clip(y0 + 1, 0, grid - 1)
    x0c = np.clip(x0, 0, grid - 1)
    x1c = np.clip(x0 + 1, 0, grid - 1)
    # bilinear with edge clamping (zeros outside never occur: out grid ≥ 1)
    out = (src[y0c][:, x0c] * ((1 - fy)[:, None] * (1 - fx)[None])[..., None]
           + src[y0c][:, x1c] * ((1 - fy)[:, None] * fx[None])[..., None]
           + src[y1c][:, x0c] * (fy[:, None] * (1 - fx)[None])[..., None]
           + src[y1c][:, x1c] * (fy[:, None] * fx[None])[..., None])
    return out.reshape(out_h * out_w, d)


# ------------------------------- decoder -------------------------------

class HunyuanLayer(nn.Module):
    cfg: HunyuanOCRConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, cos, sin, cache: KVCache, pos, mask):
        c = self.cfg
        hd = c.head_dim
        b, t, _ = x.shape
        h = RMSNorm(eps=c.rms_eps, name="input_layernorm")(x)
        q = nn.Dense(c.heads * hd, use_bias=False, dtype=x.dtype,
                     name="self_attn.q_proj")(h)
        k = nn.Dense(c.kv_heads * hd, use_bias=False, dtype=x.dtype,
                     name="self_attn.k_proj")(h)
        v = nn.Dense(c.kv_heads * hd, use_bias=False, dtype=x.dtype,
                     name="self_attn.v_proj")(h)
        q = q.reshape(b, t, c.heads, hd)
        k = k.reshape(b, t, c.kv_heads, hd)
        if c.use_qk_norm:
            q = RMSNorm(eps=c.rms_eps, name="self_attn.query_layernorm")(q)
            k = RMSNorm(eps=c.rms_eps, name="self_attn.key_layernorm")(k)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.reshape(b, t, c.kv_heads, hd).transpose(0, 2, 1, 3)
        # XDRoPE: upstream applies the rotary in F32 (llm.rs:52-67)
        q = apply_rope(q.astype(jnp.float32), cos[:, None], sin[:, None]
                       ).astype(x.dtype)
        k = apply_rope(k.astype(jnp.float32), cos[:, None], sin[:, None]
                       ).astype(x.dtype)
        cache = cache.append(self.layer_idx, k, v, pos)
        ck, cv = cache.layer(self.layer_idx)
        o = scaled_dot_product_attention(q, ck, cv, mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c.heads * hd)
        x = x + nn.Dense(c.hidden, use_bias=False, dtype=x.dtype,
                         name="self_attn.o_proj")(o)
        h = RMSNorm(eps=c.rms_eps, name="post_attention_layernorm")(x)
        x = x + SwiGLU(c.ffn, name="mlp")(h)
        return x, cache


class HunyuanDecoder(nn.Module):
    cfg: HunyuanOCRConfig

    @nn.compact
    def __call__(self, embeds, position_ids, cache: KVCache, pos, mask):
        c = self.cfg
        cos, sin = mrope_cos_sin(position_ids, c.head_dim,
                                 c.xdrope_section, c.rope_theta)
        cos = jnp.asarray(cos, jnp.float32)
        sin = jnp.asarray(sin, jnp.float32)
        x = embeds
        for li in range(c.layers):
            x, cache = HunyuanLayer(c, li, name=f"layers.{li}")(
                x, cos, sin, cache, pos, mask)
        return RMSNorm(eps=c.rms_eps, name="norm")(x), cache


class HunyuanOCRModule(nn.Module):
    """vit + model in one param tree (checkpoint root names); tied LM head
    (llm.rs:909 lm head = embed_tokens weights)."""

    cfg: HunyuanOCRConfig

    def setup(self):
        c = self.cfg
        self.vit = HunyuanVisionModel(c, name="vit")
        self.vit_pos = HyPositionTable(
            c, name="vit.embeddings.position_embedding")
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden,
                                     name="model.embed_tokens")
        self.decoder = HunyuanDecoder(c, name="model")

    def position_table(self):
        return self.vit_pos()

    def encode_image(self, patches, pos_embed, grid_h: int, grid_w: int):
        return self.vit(patches, pos_embed, grid_h, grid_w)

    def embed(self, ids):
        return self.embed_tokens(ids)

    def lm_logits(self, hidden):
        w = self.embed_tokens.embedding.astype(jnp.float32)
        return hidden.astype(jnp.float32) @ w.T

    def prefill(self, embeds, position_ids, cache, mask):
        hidden, cache = self.decoder(embeds, position_ids, cache,
                                     jnp.int32(0), mask)
        return self.lm_logits(hidden[:, -1]), hidden, cache

    def decode_step(self, tok_ids, position_ids, cache, pos):
        from .attention import create_generation_mask

        embeds = self.embed_tokens(tok_ids)[:, None, :]
        mask = create_generation_mask(cache.length + 1, cache.capacity,
                                      cache.pad)
        hidden, cache = self.decoder(embeds, position_ids, cache, pos, mask)
        cache = cache.advance(1)
        return self.lm_logits(hidden[:, -1]), hidden, cache

    def init_all(self, patches, pos_embed, grid_h, grid_w, ids,
                 position_ids):
        img = self.encode_image(patches, pos_embed, grid_h, grid_w)
        _ = self.position_table()
        emb = self.embed_tokens(ids)
        c = self.cfg
        b, t = ids.shape
        cache = KVCache.create(c.layers, b, c.kv_heads, t, c.head_dim,
                               dtype=emb.dtype)
        logits, _, _ = self.prefill(emb, position_ids, cache,
                                    jnp.ones((b, 1, t, t), bool))
        return img, logits

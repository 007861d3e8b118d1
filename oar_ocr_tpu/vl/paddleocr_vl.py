"""PaddleOCR-VL (0.9B): exact NaViT vision encoder + Ernie-4.5 decoder.

Re-expresses oar-ocr-vl/src/paddleocr_vl/ — vision.rs (SigLIP-style
encoder with 2-D rotary positions, interpolated learned position
embedding, chunked attention above 8192 tokens), ernie.rs (Ernie-4.5
decoder: explicit head_dim 128 ≠ hidden/heads, GQA kv=2, 3-D MRoPE with
sections summing to head_dim/2, RMSNorm, SwiGLU), projector.rs (mlp_AR:
pre_norm → 2×2 merge → linear_1 → gelu(erf) → linear_2) and model.rs.

Structure, dimensions and parameter names mirror the HF checkpoint
(config.json fields cited per module) so the published weights convert
1:1 (runtime/ppocr_maps.py::build_vl_map):

- ``visual.vision_model.embeddings.patch_embedding`` /
  ``.position_embedding``; ``encoder.layers.{i}.layer_norm1`` /
  ``self_attn.{q,k,v,out}_proj`` / ``layer_norm2`` / ``mlp.fc1/fc2``;
  ``post_layernorm``;
- ``mlp_AR.pre_norm / linear_1 / linear_2``;
- ``model.embed_tokens``, ``model.layers.{i}.self_attn.{q,k,v,o}_proj``,
  ``mlp.{gate,up,down}_proj``, ``input_layernorm``,
  ``post_attention_layernorm``, ``model.norm``, ``lm_head``.

TPU-first decode: prefill is one jitted program per (batch, prompt-bucket,
KV-bucket); the decode loop is a `lax.scan` of a single fused step carried
entirely on device — per-bucket jit replaces CUDA-graph capture
(decoder_graph.rs). Vision attention flips to the Pallas flash kernel at
trace time when the (static) token count exceeds the reference's 8192
threshold (vision.rs ATTN_FULL_SEQ_THRESHOLD) — the memory guard the
XLA-SDPA path needs at spotting-scale inputs.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import (apply_rope, create_generation_mask, mrope_cos_sin,
                        scaled_dot_product_attention)
from .kv_cache import KVCache

# Task prompts (paddleocr_vl/model.rs:30-38).
TASK_PROMPTS = {
    "ocr": "OCR:",
    "table": "Table Recognition:",
    "formula": "Formula Recognition:",
    "chart": "Chart Recognition:",
    "spotting": "Spotting:",
    "seal": "Seal Recognition:",
}


def strip_math_wrappers(text: str) -> str:
    """Remove one layer of $$…$$ then $…$ around a formula
    (utils/text.rs:103-114)."""
    t = text.strip()
    if t.startswith("$$") and t.endswith("$$") and len(t) >= 4:
        t = t[2:-2]
    # sequential, not elif: the reference strips the $$ layer THEN the $
    # layer (utils/text.rs:103-114), so "$$$x$$$" -> "x"
    if t.startswith("$") and t.endswith("$") and len(t) >= 2:
        t = t[1:-1]
    return t.strip()


def postprocess_table_output(text: str) -> str:
    """Table task output → HTML when it carries OTSL tokens or raw
    <table markup (paddleocr_vl/processing.rs:17-23)."""
    from .otsl import convert_otsl_to_html, looks_like_table_tokens

    trimmed = text.strip()
    if not looks_like_table_tokens(trimmed) and "<table" not in trimmed:
        return trimmed
    return convert_otsl_to_html(text)


def postprocess_task_output(text: str, task: str) -> str:
    """Per-task output cleanup (paddleocr_vl/model.rs:40-46): formulas
    lose their math wrappers, tables convert OTSL→HTML, everything else
    is trimmed."""
    if task == "formula":
        return strip_math_wrappers(text)
    if task == "table":
        return postprocess_table_output(text)
    return text.strip()

# vision.rs:12 ATTN_FULL_SEQ_THRESHOLD — above this (static) length the
# vision attention runs the Pallas flash kernel instead of full SDPA.
ATTN_FULL_SEQ_THRESHOLD = 8192


@dataclass(frozen=True)
class PaddleOCRVLConfig:
    # decoder (Ernie4.5-0.3B; config.json text fields)
    vocab_size: int = 103424
    hidden: int = 1024
    layers: int = 18
    heads: int = 16
    kv_heads: int = 2
    head_dim: int = 128          # explicit — NOT hidden/heads (ernie.rs:149)
    ffn: int = 3072
    use_bias: bool = False       # attention/mlp linear bias (config.use_bias)
    rms_eps: float = 1e-5
    rope_theta: float = 500000.0
    mrope_sections: Tuple[int, int, int] = (16, 24, 24)  # sums to head_dim/2
    # vision (NaViT/SigLIP; config.json vision_config)
    v_dim: int = 1152
    v_ffn: int = 4304
    v_layers: int = 27
    v_heads: int = 16
    v_patch: int = 14
    v_merge: int = 2
    v_image_size: int = 384      # pretrain grid for position_embedding
    v_ln_eps: float = 1e-6
    # special tokens (config.json image/vision token ids)
    image_start_id: int = 101
    image_end_id: int = 102
    image_pad_id: int = 100
    eos_id: int = 2

    @property
    def v_head_dim(self) -> int:
        return self.v_dim // self.v_heads

    @property
    def v_grid(self) -> int:
        return self.v_image_size // self.v_patch

    def tiny(self) -> "PaddleOCRVLConfig":
        """Development-size clone (same topology, small dims)."""
        return dataclasses.replace(
            self, vocab_size=512, hidden=128, layers=2, heads=4, kv_heads=2,
            head_dim=32, ffn=256, v_dim=64, v_ffn=128, v_layers=2, v_heads=4,
            v_image_size=56, mrope_sections=(8, 4, 4))


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class SwiGLU(nn.Module):
    """gate/up/down projection MLP (ernie.rs Ernie4_5Mlp naming)."""

    ffn: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        gate = nn.Dense(self.ffn, use_bias=self.use_bias, dtype=x.dtype,
                        name="gate_proj")(x)
        up = nn.Dense(self.ffn, use_bias=self.use_bias, dtype=x.dtype,
                      name="up_proj")(x)
        return nn.Dense(d, use_bias=self.use_bias, dtype=x.dtype,
                        name="down_proj")(jax.nn.silu(gate) * up)


# ----------------------------- vision -----------------------------

def vision_rope_cos_sin(h_ids: jax.Array, w_ids: jax.Array, head_dim: int,
                        theta: float = 10000.0):
    """SigLIP 2-D rotary tables (vision.rs SigLIPRotaryEmbedding +
    VisionModel.forward): inv_freq over head_dim/2 RoPE dims split
    between the h and w axes — cos/sin (…, head_dim/2) in the HF
    half-split convention."""

    quarter = head_dim // 4
    inv = 1.0 / (theta ** (jnp.arange(0, quarter, dtype=jnp.float32)
                           / quarter))
    fh = h_ids[..., None].astype(jnp.float32) * inv    # (…, d/4)
    fw = w_ids[..., None].astype(jnp.float32) * inv
    freqs = jnp.concatenate([fh, fw], -1)              # (…, d/2)
    return jnp.cos(freqs), jnp.sin(freqs)


class VisionAttention(nn.Module):
    """vision.rs VisionAttention: separate q/k/v/out projections (bias),
    2-D rope, full SDPA below the 8192-token threshold and the Pallas
    flash kernel above it."""

    heads: int

    @nn.compact
    def __call__(self, x, cos, sin, mask, valid_len):
        b, t, d = x.shape
        hd = d // self.heads
        q = nn.Dense(d, dtype=x.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=x.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=x.dtype, name="v_proj")(x)

        def heads_of(y):
            return y.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        q = apply_rope(q, cos[:, None], sin[:, None])
        k = apply_rope(k, cos[:, None], sin[:, None])
        import os

        use_flash = (t > ATTN_FULL_SEQ_THRESHOLD
                     or bool(os.environ.get("OAR_TPU_FLASH_VISION"))) \
            and not os.environ.get("OAR_TPU_DISABLE_PALLAS")
        if use_flash and valid_len is not None:
            from ..ops.flash_attention import flash_attention

            o = flash_attention(q, k, v, valid_len=valid_len)
        else:
            o = scaled_dot_product_attention(q, k, v, mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, dtype=x.dtype, name="out_proj")(o)


class VisionMlp(nn.Module):
    ffn: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(self.ffn, dtype=x.dtype, name="fc1")(x)
        h = nn.gelu(h)           # gelu_pytorch_tanh (config.hidden_act)
        return nn.Dense(d, dtype=x.dtype, name="fc2")(h)


class VisionEncoderLayer(nn.Module):
    cfg: PaddleOCRVLConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask, valid_len):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.v_ln_eps, dtype=x.dtype,
                         name="layer_norm1")(x)
        x = x + VisionAttention(c.v_heads, name="self_attn")(
            h, cos, sin, mask, valid_len)
        h = nn.LayerNorm(epsilon=c.v_ln_eps, dtype=x.dtype,
                         name="layer_norm2")(x)
        return x + VisionMlp(c.v_ffn, name="mlp")(h)


class VisionEncoder(nn.Module):
    """vision.rs VisionModel: patch embedding + interpolated position
    embedding + 2-D-rope encoder stack + post LayerNorm, over a padded
    token sequence with a validity mask (static-shape NaViT variable
    resolution)."""

    cfg: PaddleOCRVLConfig

    @nn.compact
    def __call__(self, patches, valid, h_ids, w_ids, pos_embed):
        """patches (B, T, patch²·3) in HWC-flattened order; valid (B, T);
        h_ids/w_ids (B, T) int32 patch grid positions; pos_embed
        (B, T, v_dim) — the bilinear-interpolated position embedding,
        gathered per image on the host from this module's own
        ``position_embedding`` table (model.py prepares it)."""

        c = self.cfg
        # patch_embedding: Conv2d(3, v_dim, k=patch, s=patch) ≡ a dense
        # layer over the flattened patch (weights permuted at conversion)
        x = nn.Dense(c.v_dim, dtype=patches.dtype,
                     name="embeddings.patch_embedding")(patches)
        x = x + pos_embed.astype(x.dtype)
        cos, sin = vision_rope_cos_sin(h_ids, w_ids, c.v_head_dim)
        cos = cos.astype(x.dtype)
        sin = sin.astype(x.dtype)
        mask = valid[:, None, None, :]
        vlen = jnp.sum(valid.astype(jnp.int32), -1)
        for i in range(c.v_layers):
            x = VisionEncoderLayer(c, name=f"encoder.layers.{i}")(
                x, cos, sin, mask, vlen)
        return nn.LayerNorm(epsilon=c.v_ln_eps, dtype=x.dtype,
                            name="post_layernorm")(x)

    @staticmethod
    def position_table_init(cfg: "PaddleOCRVLConfig"):
        return nn.initializers.normal(0.02)


class PositionEmbeddingTable(nn.Module):
    """Holds the learned (grid², v_dim) table under the official name;
    interpolation happens on host (model.rs interpolate_pos_encoding —
    per-image grids are dynamic, the table is tiny)."""

    cfg: PaddleOCRVLConfig

    @nn.compact
    def __call__(self):
        c = self.cfg
        return self.param("embedding", nn.initializers.normal(0.02),
                          (c.v_grid * c.v_grid, c.v_dim))


class Projector(nn.Module):
    """mlp_AR (projector.rs): pre_norm over vision dim, 2×2 block merge
    (tokens arrive in block order — host packs them), linear_1 → gelu(erf)
    → linear_2 to the decoder dim."""

    cfg: PaddleOCRVLConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, t, d = x.shape
        m2 = c.v_merge ** 2
        x = nn.LayerNorm(epsilon=c.v_ln_eps, dtype=x.dtype,
                         name="pre_norm")(x)
        x = x.reshape(b, t // m2, m2 * d)
        x = nn.Dense(m2 * d, dtype=x.dtype, name="linear_1")(x)
        x = jax.nn.gelu(x, approximate=False)      # gelu_erf (projector.rs)
        return nn.Dense(c.hidden, dtype=x.dtype, name="linear_2")(x)


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
        h = RMSNorm(eps=c.rms_eps, name="input_layernorm")(x)
        q = nn.Dense(c.heads * hd, use_bias=c.use_bias, dtype=x.dtype,
                     name="self_attn.q_proj")(h)
        k = nn.Dense(c.kv_heads * hd, use_bias=c.use_bias, dtype=x.dtype,
                     name="self_attn.k_proj")(h)
        v = nn.Dense(c.kv_heads * hd, use_bias=c.use_bias, dtype=x.dtype,
                     name="self_attn.v_proj")(h)
        q = q.reshape(b, t, c.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, c.kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, c.kv_heads, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos[:, None], sin[:, None])
        k = apply_rope(k, cos[:, None], sin[:, None])

        cache = cache.append(self.layer_idx, k, v, pos)
        ck, cv = cache.layer(self.layer_idx)
        o = scaled_dot_product_attention(q, ck, cv, mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c.heads * hd)
        x = x + nn.Dense(c.hidden, use_bias=c.use_bias, dtype=x.dtype,
                         name="self_attn.o_proj")(o)
        h = RMSNorm(eps=c.rms_eps, name="post_attention_layernorm")(x)
        x = x + SwiGLU(c.ffn, c.use_bias, name="mlp")(h)
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
            x, cache = ErnieLayer(c, li, name=f"layers.{li}")(
                x, cos, sin, cache, pos, mask)
        return RMSNorm(eps=c.rms_eps, name="norm")(x), cache


class PaddleOCRVLModule(nn.Module):
    """Bundled module exposing prefill / decode_step / encode_vision as
    flax methods (one param tree, three jitted entry points). Submodule
    names mirror the HF checkpoint tree."""

    cfg: PaddleOCRVLConfig

    def setup(self):
        c = self.cfg
        self.vision = VisionEncoder(c, name="visual.vision_model")
        self.pos_table = PositionEmbeddingTable(
            c, name="visual.vision_model.embeddings.position_embedding")
        self.projector = Projector(c, name="mlp_AR")
        self.decoder = ErnieDecoder(c, name="model")
        self.tok_emb = nn.Embed(c.vocab_size, c.hidden,
                                name="model.embed_tokens")
        self.lm_head = nn.Dense(c.vocab_size, use_bias=False,
                                name="lm_head")

    def init_all(self, patches, valid, ids, position_ids):
        """Touch every submodule once so `init` creates the full tree."""
        c = self.cfg
        t = patches.shape[1]
        h_ids = jnp.zeros(patches.shape[:2], jnp.int32)
        pos_embed = jnp.zeros(patches.shape[:2] + (c.v_dim,), patches.dtype)
        img = self.encode_vision(patches, valid, h_ids, h_ids, pos_embed)
        _table = self.pos_table()
        emb = self.tok_emb(ids)
        b, t = ids.shape
        cache = KVCache.create(c.layers, b, c.kv_heads, t, c.head_dim,
                               dtype=emb.dtype)
        mask = jnp.ones((b, 1, t, t), bool)
        logits, _ = self.prefill(emb, position_ids, cache, mask)
        return img, logits

    def encode_vision(self, patches, valid, h_ids, w_ids, pos_embed):
        return self.projector(
            self.vision(patches, valid, h_ids, w_ids, pos_embed))

    def position_table(self):
        return self.pos_table()

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

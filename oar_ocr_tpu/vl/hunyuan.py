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
from typing import Optional, Tuple

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
    # 24 layers: pinned by the published DFlash draft's taps — its
    # target_layer_ids go to 0-based 22 and the reference hard-errors
    # on id >= num_hidden_layers (model.rs:489-501), so the target has
    # >=23 layers; 24 is the natural 1B-scale count. Conversion
    # overrides from config.json as with every best-knowledge dim.
    layers: int = 24
    heads: int = 16
    kv_heads: int = 4
    head_dim: int = 128
    ffn: int = 4096
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0
    use_qk_norm: bool = True
    # 4-axis XDRoPE [seq, w, h, t] (model.rs:1482-1495; upstream HF
    # processor lines 74-94); sums to head_dim/2
    xdrope_section: Tuple[int, ...] = (16, 16, 16, 16)
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
    # preprocessor budget (preprocessor_config.json / config.json values,
    # conversion-overridable): V1 caps image tokens at Hm·(Wm+1) ≤
    # img_max_token_num then clamps the longer side to v_max_image
    # (hunyuanocr/processing.rs:97-108); a V1.5 checkpoint sets
    # img_max_token_num=None (only smart_resize applies, :111)
    min_pixels: int = 32 * 32
    max_pixels: int = 16_777_216
    img_max_token_num: Optional[int] = 4096
    # token ids (config.json; placeholder strings are tokenizer specials —
    # hy_place_holder no.100/102/101 = start/image/end, model.rs:1401)
    bos_id: int = 1
    eos_id: int = 2
    image_start_id: int = 120814
    image_end_id: int = 120815
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
            head_dim=16, ffn=128, xdrope_section=(2, 2, 2, 2), v_dim=32,
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
        import os

        if (t > 8192                      # vision.rs memory-guard threshold
                and not os.environ.get("OAR_TPU_DISABLE_PALLAS")):
            from ..ops.flash_attention import flash_attention

            o = flash_attention(q, k, v,
                                valid_len=jnp.full((b,), t, jnp.int32))
        else:
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
    def __call__(self, embeds, position_ids, cache: KVCache, pos, mask,
                 aux_layers: Tuple[int, ...] = ()):
        """``aux_layers``: 1-based post-layer taps for the DFlash draft
        (llm.rs:1108-1122); static per jitted entry point."""
        c = self.cfg
        cos, sin = mrope_cos_sin(position_ids, c.head_dim,
                                 c.xdrope_section, c.rope_theta)
        cos = jnp.asarray(cos, jnp.float32)
        sin = jnp.asarray(sin, jnp.float32)
        x = embeds
        aux = []
        for li in range(c.layers):
            x, cache = HunyuanLayer(c, li, name=f"layers.{li}")(
                x, cos, sin, cache, pos, mask)
            if (li + 1) in aux_layers:
                aux.append(x)
        out = RMSNorm(eps=c.rms_eps, name="norm")(x)
        if aux_layers:
            return out, cache, jnp.concatenate(aux, axis=-1)
        return out, cache


class HunyuanOCRModule(nn.Module):
    """vit + model in one param tree (checkpoint root names); tied LM head
    (llm.rs:909 lm head = embed_tokens weights)."""

    cfg: HunyuanOCRConfig
    # DFlash target taps (dflash config target_layer_ids); empty = off
    aux_layers: Tuple[int, ...] = ()

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

    def prefill_aux(self, embeds, position_ids, cache, mask):
        """prefill + concatenated mid-layer hiddens (DFlash context)."""
        hidden, cache, aux = self.decoder(embeds, position_ids, cache,
                                          jnp.int32(0), mask,
                                          self.aux_layers)
        return self.lm_logits(hidden[:, -1]), hidden, cache, aux

    def decode_block_aux(self, tok_ids, position_ids, cache, pos):
        """Causal verify block + aux hiddens (dflash verify pass)."""
        b, t = tok_ids.shape
        embeds = self.embed_tokens(tok_ids)
        cap = cache.capacity
        cap_pos = jnp.arange(cap)[None, None, None, :]
        q_pos = jnp.arange(t)[None, None, :, None]
        limit = cache.length[:, None, None, None] + q_pos + 1
        mask = cap_pos < limit
        if cache.pad is not None:
            mask = mask & (cap_pos >= cache.pad[:, None, None, None])
        hidden, cache, aux = self.decoder(embeds, position_ids, cache,
                                          pos, mask, self.aux_layers)
        cache = cache.advance(t)
        return self.lm_logits(hidden), hidden, cache, aux

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


# ------------------------------- driver -------------------------------

def build_position_ids(seq_len: int, first_image_tok: int,
                       hm: int, wm: int) -> np.ndarray:
    """4-axis XDRoPE position ids [seq, w, h, t] (model.rs:1476-1527):
    every axis holds the arange; the spatial run of (wm+1)·hm tokens
    starting ONE AFTER the first image token (the begin marker keeps its
    arange position) gets w = col cycle, h = row, t = 0."""
    pos = np.broadcast_to(np.arange(seq_len, dtype=np.int32),
                          (4, seq_len)).copy()
    start = first_image_tok + 1
    n = (wm + 1) * hm
    j = np.arange(n)
    pos[1, start:start + n] = j % (wm + 1)
    pos[2, start:start + n] = j // (wm + 1)
    pos[3, start:start + n] = 0
    return pos


class HunyuanOCRModel:
    """Public entry: image + instruction → text (batch-1 per image, the
    reference's decode focus; model.rs:656-700 generate loop). Scan decode
    on device, one compiled program per (prompt-bucket, capacity)."""

    def __init__(self, params=None, *, cfg: "HunyuanOCRConfig" = None,
                 tokenizer=None, runtime=None, seed: int = 0):
        from ..runtime.runtime import Runtime
        from .model import ByteTokenizer

        self.cfg = cfg or HunyuanOCRConfig()
        self.runtime = runtime or Runtime.default()
        self.tokenizer = tokenizer or ByteTokenizer()
        self.module = HunyuanOCRModule(self.cfg)
        if params is None:
            params = self._init_params(seed)
        self.params = self.runtime.put_params_vl(params)
        self._encode = jax.jit(
            lambda p, x, pe, gh, gw: self.module.apply(
                p, x, pe, gh, gw, method=HunyuanOCRModule.encode_image),
            static_argnames=("gh", "gw"))
        self._gen = jax.jit(self._prefill_decode,
                            static_argnames=("max_new", "capacity"))
        self._pos_table = np.asarray(self.module.apply(
            self.params, method=HunyuanOCRModule.position_table
        ).astype(jnp.float32))

    def _init_params(self, seed: int):
        c = self.cfg
        rng = jax.random.PRNGKey(seed)
        m = c.v_merge
        patches = jnp.zeros((1, m * m, c.v_patch ** 2 * 3), jnp.float32)
        pos = jnp.zeros((m * m, c.v_dim), jnp.float32)
        ids = jnp.zeros((1, 4), jnp.int32)
        pids = jnp.zeros((4, 1, 4), jnp.int32)
        return self.module.init(rng, patches, pos, m, m, ids, pids,
                                method=HunyuanOCRModule.init_all)

    def _prefill_decode(self, params, embeds, position_ids,
                        *, max_new: int, capacity: int):
        from .attention import create_causal_mask

        c = self.cfg
        b, t, _ = embeds.shape
        cache = KVCache.create(c.layers, b, c.kv_heads, capacity,
                               c.head_dim, dtype=embeds.dtype)
        full = jnp.broadcast_to(create_causal_mask(t), (b, 1, t, t))
        full = jnp.concatenate(
            [full, jnp.zeros((b, 1, t, capacity - t), bool)], -1)
        logits, _, cache = self.module.apply(
            params, embeds, position_ids, cache, full,
            method=HunyuanOCRModule.prefill)
        cache = cache.advance(t)
        first = jnp.argmax(logits, -1).astype(jnp.int32)

        def step(carry, i):
            tok, cache, done = carry
            pids = jnp.broadcast_to((t + i)[None, None, None], (4, b, 1))
            logits, _, cache = self.module.apply(
                params, tok, pids, cache, t + i,
                method=HunyuanOCRModule.decode_step)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            nxt = jnp.where(done, c.eos_id, nxt)
            return (nxt, cache, done | (nxt == c.eos_id)), tok

        (_, _, _), ids = jax.lax.scan(
            step, (first, cache, first == c.eos_id),
            jnp.arange(max_new), length=max_new)
        return jnp.transpose(ids, (1, 0))

    def _prepare_image(self, image: np.ndarray):
        """V1 preprocess (hunyuanocr/processing.rs:63-140): smart resize
        under the pixel budget, token cap Hm·(Wm+1) ≤ img_max_token_num,
        longer side clamped to the learned-position grid v_max_image."""
        import cv2

        from .processing import (VisionProcessorConfig,
                                 clamp_to_max_image_size,
                                 smart_resize, smart_resize_token_limited)

        c = self.cfg
        h, w = image.shape[:2]
        pcfg = VisionProcessorConfig(
            patch_size=c.v_patch, merge_size=c.v_merge,
            min_pixels=c.min_pixels, max_pixels=c.max_pixels)
        if c.img_max_token_num is not None:
            th, tw = smart_resize_token_limited(h, w, pcfg,
                                                c.img_max_token_num)
            th, tw = clamp_to_max_image_size(th, tw, pcfg.factor,
                                             c.v_max_image)
        else:
            th, tw = smart_resize(h, w, pcfg)
        resized = cv2.resize(image, (tw, th),
                             interpolation=cv2.INTER_LINEAR)
        x = (resized.astype(np.float32) / 255.0 - 0.5) / 0.5
        p = c.v_patch
        gh, gw = th // p, tw // p
        patches = x.reshape(gh, p, gw, p, 3).transpose(0, 2, 1, 3, 4)
        return patches.reshape(1, gh * gw, p * p * 3), gh, gw

    def generate(self, images, instruction: str = "OCR:",
                 *, max_new_tokens: int = 256):
        from .kv_cache import decoder_cache_capacity

        c = self.cfg
        out = []
        for image in images:
            patches, gh, gw = self._prepare_image(image)
            pos = interpolate_positions(self._pos_table[1:], c.v_grid,
                                        gh, gw)
            img_emb = self._encode(
                self.params,
                jnp.asarray(patches, self.runtime.compute_dtype),
                jnp.asarray(pos, self.runtime.compute_dtype), gh=gh, gw=gw)
            hm, wm = gh // c.v_merge, gw // c.v_merge
            n_img = hm * (wm + 1) + 2          # incl. begin/end markers
            row = ([c.bos_id, c.image_start_id]
                   + [c.image_token_id] * n_img
                   + [c.image_end_id]
                   + self.tokenizer.encode(instruction))
            ids = np.asarray(row, np.int32)
            pids = build_position_ids(len(row), 2, hm, wm)
            embeds = self.module.apply(
                self.params, jnp.asarray(ids)[None],
                method=HunyuanOCRModule.embed)
            # image embeddings replace the whole expanded run
            embeds = embeds.at[0, 2:2 + n_img].set(
                img_emb.astype(embeds.dtype))
            capacity = decoder_cache_capacity(len(row), max_new_tokens)
            toks = self._gen(self.params, embeds,
                             jnp.asarray(pids)[:, None, :],
                             max_new=max_new_tokens, capacity=capacity)
            ids_out = []
            for v in np.asarray(toks)[0].tolist():
                if v == c.eos_id:
                    break
                ids_out.append(int(v))
            out.append(self.tokenizer.decode(ids_out))
        return out


class HunyuanOCRSpeculative(HunyuanOCRModel):
    """Exact HunyuanOCR + the real DFlash block draft (vl/dflash.py) —
    the deployed decode configuration (model.rs loads model + dflash/ as
    separate checkpoints; draft params live in their own tree here too).
    Greedy-exact: emitted tokens come only from target argmaxes."""

    def __init__(self, params=None, *, cfg=None, dflash_cfg=None,
                 dflash_params=None, tokenizer=None, runtime=None,
                 seed: int = 0):
        from .dflash import DFlashConfig, DFlashDraft

        self.dcfg = dflash_cfg or DFlashConfig()
        base_cfg = cfg or HunyuanOCRConfig()
        # module with aux taps at the draft's target layers: config ids
        # are 0-BASED layer indices → +1 is the 1-based post-layer tap.
        # Out-of-range ids are a hard error (model.rs:489-501) — a
        # silent filter would change fc's input width and break
        # converted draft weights.
        bad = [i for i in self.dcfg.target_layer_ids
               if not 0 <= i < base_cfg.layers]
        if bad:
            from ..errors import InvalidInputError

            raise InvalidInputError(
                "DFlash target_layer_ids out of range for target",
                bad=bad, layers=base_cfg.layers)
        self._aux_layers = tuple(
            i + 1 for i in self.dcfg.target_layer_ids)
        # build via parent but with taps
        self.cfg = base_cfg
        from ..runtime.runtime import Runtime
        from .model import ByteTokenizer

        self.runtime = runtime or Runtime.default()
        self.tokenizer = tokenizer or ByteTokenizer()
        self.module = HunyuanOCRModule(base_cfg,
                                       aux_layers=self._aux_layers)
        if params is None:
            params = self._init_params(seed)
        self.params = self.runtime.put_params_vl(params)
        self._encode = jax.jit(
            lambda p, x, pe, gh, gw: self.module.apply(
                p, x, pe, gh, gw, method=HunyuanOCRModule.encode_image),
            static_argnames=("gh", "gw"))
        self._gen = jax.jit(self._prefill_decode,
                            static_argnames=("max_new", "capacity"))
        self._pos_table = np.asarray(self.module.apply(
            self.params, method=HunyuanOCRModule.position_table
        ).astype(jnp.float32))

        self.draft = DFlashDraft(self.dcfg)
        if dflash_params is None:
            from .paged_kv import PagedKVCache

            aux_w = base_cfg.hidden * len(self._aux_layers)
            rngs = jax.random.PRNGKey(seed + 1)
            aux0 = jnp.zeros((1, 2, aux_w), jnp.float32)
            q0 = jnp.zeros((1, self.dcfg.block_size, base_cfg.hidden),
                           jnp.float32)
            ctx0 = PagedKVCache.create(
                self.dcfg.layers, 1, self.dcfg.kv_heads, 1,
                self.dcfg.page_size, self.dcfg.head_dim,
                dtype=jnp.float32)

            def _init_all(m):
                m.context_rows(aux0, 0)
                return m.draft_hidden(q0, ctx0, 1, 0)

            dflash_params = self.draft.init(rngs, method=_init_all)
        self.draft_params = self.runtime.put_params_vl(dflash_params)
        self._rounds: dict = {}

    def _spec_round(self, params, dparams, tok, cache, ctx, wpos,
                    *, n_pages: int):
        from .dflash import DFlashDraft
        from .speculative import verify_draft

        d = self.dcfg
        b = tok.shape[0]
        k = d.block_size - 1
        # draft block: bonus + mask embeds through the draft, proposals
        # via the TARGET's tied LM head
        mask_ids = jnp.full((b, k), d.mask_token_id % self.cfg.vocab_size,
                            jnp.int32)
        q_ids = jnp.concatenate([tok[:, None], mask_ids], axis=1)
        q_emb = self.module.apply(params, q_ids,
                                  method=HunyuanOCRModule.embed)
        hidden = self.draft.apply(dparams, q_emb, ctx, n_pages,
                                  ctx.length[0],
                                  method=DFlashDraft.draft_hidden)
        logits = self.module.apply(params, hidden[:, 1:],
                                   method=HunyuanOCRModule.lm_logits)
        drafts = jnp.argmax(logits, -1).astype(jnp.int32)

        block = jnp.concatenate([tok[:, None], drafts], 1)
        pids = (wpos + jnp.arange(k + 1))[None, None, :]
        pids = jnp.broadcast_to(pids, (4, b, k + 1))
        prev_len = cache.length
        t_logits, _h, cache, aux = self.module.apply(
            params, block, pids, cache, wpos,
            method=HunyuanOCRModule.decode_block_aux)
        res = verify_draft(drafts, t_logits)
        a = res.accepted
        cache = cache.trim_to(prev_len[0] + 1 + a[0])
        next_tok = jnp.take_along_axis(res.next_tokens, a[:, None],
                                       axis=1)[:, 0]
        ctx_len = ctx.length[0]
        ks, vs = self.draft.apply(dparams, aux, ctx_len,
                                  method=DFlashDraft.context_rows)
        for li in range(d.layers):
            ctx = ctx.append(li, ks[li], vs[li], ctx_len)
        ctx = ctx.advance(1 + a[0]).trim_to(ctx_len + 1 + a[0])
        return res.next_tokens, a, next_tok, cache, ctx

    def generate_speculative(self, images, instruction: str = "OCR:",
                             *, max_new_tokens: int = 128):
        from .dflash import DFlashDraft
        from .paged_kv import PagedKVCache, page_bucket

        c = self.cfg
        d = self.dcfg
        k = d.block_size - 1
        out = []
        for image in images:
            patches, gh, gw = self._prepare_image(image)
            pos = interpolate_positions(self._pos_table[1:], c.v_grid,
                                        gh, gw)
            img_emb = self._encode(
                self.params, jnp.asarray(patches, jnp.float32),
                jnp.asarray(pos, jnp.float32), gh=gh, gw=gw)
            hm, wm = gh // c.v_merge, gw // c.v_merge
            n_img = hm * (wm + 1) + 2
            row = ([c.bos_id, c.image_start_id]
                   + [c.image_token_id] * n_img + [c.image_end_id]
                   + self.tokenizer.encode(instruction))
            ids = np.asarray(row, np.int32)
            t = len(row)
            pids = build_position_ids(t, 2, hm, wm)
            embeds = self.module.apply(self.params, jnp.asarray(ids)[None],
                                       method=HunyuanOCRModule.embed)
            embeds = embeds.at[0, 2:2 + n_img].set(
                img_emb.astype(embeds.dtype))

            from .attention import create_causal_mask
            from .kv_cache import decoder_cache_capacity

            capacity = decoder_cache_capacity(t, max_new_tokens + k + 1)
            cache = KVCache.create(c.layers, 1, c.kv_heads, capacity,
                                   c.head_dim, dtype=embeds.dtype)
            full = jnp.broadcast_to(create_causal_mask(t), (1, 1, t, t))
            full = jnp.concatenate(
                [full, jnp.zeros((1, 1, t, capacity - t), bool)], -1)
            import functools

            logits, _h, cache, aux = jax.jit(functools.partial(
                self.module.apply, method=HunyuanOCRModule.prefill_aux))(
                self.params, embeds, jnp.asarray(pids)[:, None, :], cache,
                full)
            cache = cache.advance(t)

            n_pages_cap = max(
                1, -(-(t + max_new_tokens + k + 1) // d.page_size))
            ctx = PagedKVCache.create(d.layers, 1, d.kv_heads, n_pages_cap,
                                      d.page_size, d.head_dim,
                                      dtype=embeds.dtype)
            ks, vs = jax.jit(functools.partial(
                self.draft.apply, method=DFlashDraft.context_rows))(
                self.draft_params, aux, jnp.int32(0))
            for li in range(d.layers):
                ctx = ctx.append(li, ks[li], vs[li], jnp.int32(0))
            ctx = ctx.advance(t)

            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            wpos = t
            ids_out = [int(tok[0])]
            while len(ids_out) < max_new_tokens and ids_out[-1] != c.eos_id:
                npg = page_bucket(wpos + k + 1, d.page_size, ctx.num_pages)
                rnd = self._rounds.get(npg)
                if rnd is None:
                    import functools

                    rnd = jax.jit(functools.partial(self._spec_round,
                                                    n_pages=npg))
                    self._rounds[npg] = rnd
                emitted, a, tok, cache, ctx = rnd(
                    self.params, self.draft_params, tok, cache, ctx, wpos)
                n_acc = int(a[0])
                for v_ in np.asarray(emitted)[0, : n_acc + 1].tolist():
                    ids_out.append(int(v_))
                    if v_ == c.eos_id or len(ids_out) >= max_new_tokens:
                        break
                wpos += 1 + n_acc
            final = [i for i in ids_out if i != c.eos_id]
            out.append(self.tokenizer.decode(final))
        return out

"""Exact per-family vision towers: MinerU (Qwen2-VL) + HPD (InternViT).

VERDICT r1 #3 remainder. Flax module names mirror the HF checkpoint trees
so ppocr_maps.hf_vl_name-style renaming converts the published weights:

MinerU 2.5 (oar-ocr-vl/src/mineru/vision.rs, root ``visual.`` at
model.rs:209):
- ``patch_embed.proj``: a (embed, 3·t·p²) matmul over flattened patches
  (vision.rs:238-289 loads the conv kernel reshaped to 2-D);
- ``blocks.{i}``: norm1/norm2 LayerNorms, fused ``attn.qkv`` +
  ``attn.proj``, ``mlp.fc1/fc2`` with quick_gelu (x·σ(1.702x),
  vision.rs:11-29); 2-D rotary over h/w patch positions emitted in
  merge-block order (build_vision_pos_emb:719-741), head_dim/2 freq dims
  split between axes, applied over the doubled table;
- ``merger``: ln_q LayerNorm → group merge² rows → mlp.0 → gelu_erf →
  mlp.2 (vision.rs:489-554).

HPD-Parsing (oar-ocr-vl/src/hpd_parsing/vision.rs — InternViT-300M +
InternVL pixel-shuffle):
- ``vision_model.embeddings``: patch_embedding (conv-as-matmul, bias) +
  class_embedding + learned position_embedding over the fixed 448-px
  grid (+cls);
- ``vision_model.encoder.layers.{i}``: norm1/norm2, fused ``attn.qkv``
  (bias per config) + ``attn.proj`` (always bias), ls1/ls2 layer scales,
  mlp.fc1/fc2 gelu_erf;
- pixel-shuffle v2 (vision.rs:300-330: reshape → transpose → reshape →
  transpose) then the ``mlp1.{0,1,3}`` projector (LN → fc → gelu_erf →
  fc) to the LLM width.

The InternVL dynamic 448-px tiling (processing.rs:99-152 target_ratios /
closest_ratio + thumbnail) is re-expressed host-side in
``intern_target_ratios`` / ``intern_closest_ratio`` with the reference's
own fixture values as tests.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# --------------------------- MinerU (Qwen2-VL) ---------------------------

@dataclass(frozen=True)
class MinerUVisionConfig:
    embed_dim: int = 1280
    heads: int = 16
    mlp_ratio: float = 4.0
    layers: int = 32
    patch: int = 14
    temporal_patch: int = 2
    merge: int = 2
    out_hidden: int = 1536          # llm hidden (merger.mlp.2 out)
    ln_eps: float = 1e-6
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.heads

    @property
    def ffn(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    def tiny(self) -> "MinerUVisionConfig":
        return dataclasses.replace(self, embed_dim=32, heads=4, layers=2,
                                   patch=4, temporal_patch=1, out_hidden=48)


def mineru_vision_positions(h: int, w: int, merge: int
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """h/w position per patch token in merge-block order
    (build_vision_pos_emb:728-741)."""
    hp, wp = [], []
    for hb in range(h // merge):
        for wb in range(w // merge):
            for hi in range(merge):
                for wi in range(merge):
                    hp.append(hb * merge + hi)
                    wp.append(wb * merge + wi)
    return np.asarray(hp, np.int32), np.asarray(wp, np.int32)


def _qwen_vision_rope(hpos, wpos, head_dim: int, theta: float):
    """cos/sin (T, head_dim): per-axis freqs over head_dim/4 dims each,
    concatenated then doubled (apply via rotate_half)."""
    quarter = head_dim // 4
    inv = 1.0 / (theta ** (np.arange(quarter, dtype=np.float32) * 2
                           / (head_dim // 2)))
    fh = hpos[:, None].astype(np.float32) * inv[None]
    fw = wpos[:, None].astype(np.float32) * inv[None]
    freqs = np.concatenate([fh, fw], -1)            # (T, head_dim/2)
    emb = np.concatenate([freqs, freqs], -1)        # (T, head_dim)
    return np.cos(emb), np.sin(emb)


def _rotate_half(x):
    d2 = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)


class MinerUVisionBlock(nn.Module):
    cfg: MinerUVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin):
        c = self.cfg
        t, d = x.shape
        hd = c.head_dim
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=x.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * d, dtype=x.dtype, name="attn.qkv")(h)
        qkv = qkv.reshape(t, 3, c.heads, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]       # (T, H, hd)
        q = q.transpose(1, 0, 2)                        # (H, T, hd)
        k = k.transpose(1, 0, 2)
        v = v.transpose(1, 0, 2)
        cs = cos[None].astype(jnp.float32)
        sn = sin[None].astype(jnp.float32)
        q = (q.astype(jnp.float32) * cs
             + _rotate_half(q.astype(jnp.float32)) * sn).astype(x.dtype)
        k = (k.astype(jnp.float32) * cs
             + _rotate_half(k.astype(jnp.float32)) * sn).astype(x.dtype)
        attn = jnp.einsum("hqd,hkd->hqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn * (hd ** -0.5), -1).astype(x.dtype)
        o = jnp.einsum("hqk,hkd->hqd", attn, v)
        o = o.transpose(1, 0, 2).reshape(t, d)
        x = x + nn.Dense(d, dtype=x.dtype, name="attn.proj")(o)
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=x.dtype, name="norm2")(x)
        h = nn.Dense(c.ffn, dtype=x.dtype, name="mlp.fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(d, dtype=x.dtype, name="mlp.fc2")(h)
        return x + h


class MinerUVisionModel(nn.Module):
    """(T, 3·tp·p²) flattened patches for ONE image grid → merged tokens
    (T/merge², out_hidden)."""

    cfg: MinerUVisionConfig

    @nn.compact
    def __call__(self, patches, cos, sin):
        c = self.cfg
        x = nn.Dense(c.embed_dim, use_bias=False, dtype=patches.dtype,
                     name="patch_embed.proj")(patches)
        for i in range(c.layers):
            x = MinerUVisionBlock(c, name=f"blocks.{i}")(x, cos, sin)
        # merger
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=x.dtype,
                         name="merger.ln_q")(x)
        g = c.merge ** 2
        x = x.reshape(x.shape[0] // g, g * c.embed_dim)
        x = nn.Dense(g * c.embed_dim, dtype=x.dtype, name="merger.mlp.0")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(c.out_hidden, dtype=x.dtype, name="merger.mlp.2")(x)


# --------------------------- HPD (InternViT) ---------------------------

@dataclass(frozen=True)
class HpdVisionConfig:
    hidden: int = 1024
    ffn: int = 4096
    layers: int = 24
    heads: int = 16
    image_size: int = 448
    patch: int = 14
    ln_eps: float = 1e-6
    qkv_bias: bool = True
    downsample_ratio: float = 0.5
    llm_hidden: int = 1024

    @property
    def grid(self) -> int:
        return self.image_size // self.patch

    @property
    def downsample(self) -> int:
        return int(round(1.0 / self.downsample_ratio))

    def tiny(self) -> "HpdVisionConfig":
        return dataclasses.replace(self, hidden=32, ffn=64, layers=2,
                                   heads=4, image_size=32, patch=4,
                                   llm_hidden=48)


class InternBlock(nn.Module):
    cfg: HpdVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, t, d = x.shape
        hd = d // c.heads
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=x.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * d, use_bias=c.qkv_bias, dtype=x.dtype,
                       name="attn.qkv")(h)
        qkv = qkv.reshape(b, t, 3, c.heads, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn * (hd ** -0.5), -1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        o = nn.Dense(d, dtype=x.dtype, name="attn.proj")(o)
        ls1 = self.param("ls1", nn.initializers.ones, (d,))
        x = x + o * ls1.astype(x.dtype)
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=x.dtype, name="norm2")(x)
        h = nn.Dense(c.ffn, dtype=x.dtype, name="mlp.fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=x.dtype, name="mlp.fc2")(h)
        ls2 = self.param("ls2", nn.initializers.ones, (d,))
        return x + h * ls2.astype(x.dtype)


class HpdVisionModel(nn.Module):
    """(tiles, grid², 3·p²) → (tiles·(grid/ds)², llm_hidden) — InternViT
    encoder + exact pixel-shuffle v2 + mlp1 projector."""

    cfg: HpdVisionConfig

    @nn.compact
    def __call__(self, patches):
        c = self.cfg
        tiles, pc, _ = patches.shape
        g = c.grid
        x = nn.Dense(c.hidden, dtype=patches.dtype,
                     name="vision_model.embeddings.patch_embedding"
                     )(patches)
        cls = self.param("vision_model.embeddings.class_embedding",
                         nn.initializers.normal(0.02), (1, 1, c.hidden))
        pos = self.param("vision_model.embeddings.position_embedding",
                         nn.initializers.normal(0.02),
                         (1, g * g + 1, c.hidden))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (tiles, 1, c.hidden)),
             x], axis=1) + pos.astype(x.dtype)
        for i in range(c.layers):
            x = InternBlock(c, name=f"vision_model.encoder.layers.{i}")(x)
        x = x[:, 1:].reshape(tiles, g, g, c.hidden)
        ds = c.downsample
        r = g // ds
        # pixel-shuffle v2 exact ordering (vision.rs:300-330)
        x = x.reshape(tiles, g, r, c.hidden * ds)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(tiles, r, r, c.hidden * ds * ds)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(tiles * r * r, c.hidden * ds * ds)
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name="mlp1.0")(x)
        x = nn.Dense(c.llm_hidden, dtype=x.dtype, name="mlp1.1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(c.llm_hidden, dtype=x.dtype, name="mlp1.3")(x)


# ------------------------ InternVL dynamic tiling ------------------------

def intern_target_ratios(min_blocks: int, max_blocks: int
                         ) -> List[Tuple[int, int]]:
    """processing.rs:99-113 — unique (cols, rows) with blocks in range,
    sorted by (area, cols, rows)."""
    ratios = []
    for n in range(min_blocks, max_blocks + 1):
        for cols in range(1, n + 1):
            for rows in range(1, n + 1):
                blocks = cols * rows
                if (min_blocks <= blocks <= max_blocks
                        and (cols, rows) not in ratios):
                    ratios.append((cols, rows))
    ratios.sort(key=lambda cr: (cr[0] * cr[1], cr[0], cr[1]))
    return ratios


def intern_closest_ratio(width: int, height: int, image_size: int,
                         ratios: Sequence[Tuple[int, int]]
                         ) -> Tuple[int, int]:
    """processing.rs:115-152 — aspect-filtered (≤0.2 diff) candidates by
    area distance, best aspect among the top 3; fall back to unfiltered."""
    aspect = width / height
    area = width * height

    def entry(cr):
        cols, rows = cr
        ar_diff = abs(aspect - cols / rows)
        target_area = float(image_size) ** 2 * cols * rows
        return (cr, abs(area - target_area), ar_diff)

    cands = [entry(cr) for cr in ratios
             if abs(aspect - cr[0] / cr[1]) <= 0.2]
    if not cands:
        cands = [entry(cr) for cr in ratios]
    cands.sort(key=lambda e: e[1])
    best = min(cands[:3], key=lambda e: e[2])
    return best[0]


def intern_tile_image(image: np.ndarray, *, image_size: int = 448,
                      min_blocks: int = 1, max_blocks: int = 12,
                      use_thumbnail: bool = True) -> List[np.ndarray]:
    """Dynamic tiling (processing.rs:17-68): pick the closest grid, resize
    to cols·rows tiles of image_size², split row-major, append a
    thumbnail when more than one tile."""
    import cv2

    h, w = image.shape[:2]
    mb = max_blocks + 1 if use_thumbnail and max_blocks != 1 else max_blocks
    ratios = intern_target_ratios(min_blocks, mb)
    cols, rows = intern_closest_ratio(w, h, image_size, ratios)
    resized = cv2.resize(image, (cols * image_size, rows * image_size),
                         interpolation=cv2.INTER_LINEAR)
    tiles = []
    for r in range(rows):
        for c_ in range(cols):
            tiles.append(resized[r * image_size:(r + 1) * image_size,
                                 c_ * image_size:(c_ + 1) * image_size])
    if use_thumbnail and cols * rows != 1:
        tiles.append(cv2.resize(image, (image_size, image_size),
                                interpolation=cv2.INTER_LINEAR))
    return tiles


# --------------------------- GLM-OCR (GLM-4V) ---------------------------

@dataclass(frozen=True)
class GlmVisionConfig:
    """glmocr/vision.rs GlmOcrVisionConfig (dims from config.json)."""

    hidden: int = 1536
    heads: int = 12
    ffn: int = 4224
    depth: int = 24
    patch: int = 14
    merge: int = 2
    out_hidden: int = 1536
    attention_bias: bool = False
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    def tiny(self) -> "GlmVisionConfig":
        return dataclasses.replace(self, hidden=32, heads=4, ffn=64,
                                   depth=2, patch=4, out_hidden=48)


class _TowersRMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        return ((x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps))
                * scale.astype(jnp.float32)).astype(x.dtype)


class GlmVisionBlock(nn.Module):
    """norm1/norm2 RMSNorms, fused attn.qkv + per-head q/k RMSNorms +
    attn.proj, SwiGLU mlp (glmocr/vision.rs:203-525)."""

    cfg: GlmVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin):
        c = self.cfg
        t, d = x.shape
        hd = c.head_dim
        h = _TowersRMSNorm(eps=c.rms_eps, name="norm1")(x)
        qkv = nn.Dense(3 * d, use_bias=c.attention_bias, dtype=x.dtype,
                       name="attn.qkv")(h)
        qkv = qkv.reshape(t, 3, c.heads, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = _TowersRMSNorm(eps=c.rms_eps, name="attn.q_norm")(q)
        k = _TowersRMSNorm(eps=c.rms_eps, name="attn.k_norm")(k)
        q = q.transpose(1, 0, 2)
        k = k.transpose(1, 0, 2)
        v = v.transpose(1, 0, 2)
        cs = cos[None].astype(jnp.float32)
        sn = sin[None].astype(jnp.float32)
        q = (q.astype(jnp.float32) * cs
             + _rotate_half(q.astype(jnp.float32)) * sn).astype(x.dtype)
        k = (k.astype(jnp.float32) * cs
             + _rotate_half(k.astype(jnp.float32)) * sn).astype(x.dtype)
        attn = jnp.einsum("hqd,hkd->hqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn * (hd ** -0.5), -1).astype(x.dtype)
        o = jnp.einsum("hqk,hkd->hqd", attn, v)
        o = o.transpose(1, 0, 2).reshape(t, d)
        x = x + nn.Dense(d, use_bias=c.attention_bias, dtype=x.dtype,
                         name="attn.proj")(o)
        h = _TowersRMSNorm(eps=c.rms_eps, name="norm2")(x)
        gate = nn.Dense(c.ffn, use_bias=False, dtype=x.dtype,
                        name="mlp.gate_proj")(h)
        up = nn.Dense(c.ffn, use_bias=False, dtype=x.dtype,
                      name="mlp.up_proj")(h)
        h = nn.Dense(d, use_bias=False, dtype=x.dtype,
                     name="mlp.down_proj")(jax.nn.silu(gate) * up)
        return x + h


class GlmVisionModel(nn.Module):
    """(T, 3·p²) merge-block-ordered patches → (T/merge², out_hidden)
    (glmocr/vision.rs:602-861): blocks → post RMSNorm → per-block
    downsample conv → merger (proj → LN → tanh-gelu → SwiGLU)."""

    cfg: GlmVisionConfig

    @nn.compact
    def __call__(self, patches, cos, sin):
        c = self.cfg
        x = nn.Dense(c.hidden, use_bias=True, dtype=patches.dtype,
                     name="patch_embed.proj")(patches)
        for i in range(c.depth):
            x = GlmVisionBlock(c, name=f"blocks.{i}")(x, cos, sin)
        x = _TowersRMSNorm(eps=c.rms_eps, name="post_layernorm")(x)
        m = c.merge
        t = x.shape[0]
        x = x.reshape(t // (m * m), m, m, c.hidden)
        x = nn.Conv(c.out_hidden, (m, m), strides=(m, m), padding="VALID",
                    dtype=x.dtype, name="downsample")(x)
        x = x.reshape(t // (m * m), c.out_hidden)
        # merger (candle .gelu() is the TANH approximation; the gate act is
        # cfg.hidden_act = silu)
        x = nn.Dense(c.out_hidden, use_bias=False, dtype=x.dtype,
                     name="merger.proj")(x)
        x = nn.LayerNorm(epsilon=c.rms_eps, dtype=x.dtype,
                         name="merger.post_projection_norm")(x)
        x = jax.nn.gelu(x, approximate=True)
        ctx = c.out_hidden * 3                     # context_dim = out·in_ch
        gate = nn.Dense(ctx, use_bias=False, dtype=x.dtype,
                        name="merger.gate_proj")(x)
        up = nn.Dense(ctx, use_bias=False, dtype=x.dtype,
                      name="merger.up_proj")(x)
        return nn.Dense(c.out_hidden, use_bias=False, dtype=x.dtype,
                        name="merger.down_proj")(jax.nn.silu(gate) * up)


# --------------------------- OvisOCR2 (Qwen2.5-VL-ish) ---------------------

@dataclass(frozen=True)
class OvisVisionConfig:
    """ovisocr2/vision.rs OvisOcr2VisionConfig."""

    hidden: int = 1152
    heads: int = 16
    ffn: int = 4304
    depth: int = 27
    patch: int = 14
    merge: int = 2
    out_hidden: int = 1024
    num_positions: int = 1024           # pos_embed rows (grid²)
    ln_eps: float = 1e-6
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def pos_grid(self) -> int:
        return int(round(self.num_positions ** 0.5))

    def tiny(self) -> "OvisVisionConfig":
        return dataclasses.replace(self, hidden=32, heads=4, ffn=64,
                                   depth=2, patch=4, out_hidden=48,
                                   num_positions=16)


class OvisVisionBlock(nn.Module):
    cfg: OvisVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin):
        c = self.cfg
        t, d = x.shape
        hd = c.head_dim
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=x.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * d, dtype=x.dtype, name="attn.qkv")(h)
        qkv = qkv.reshape(t, 3, c.heads, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = q.transpose(1, 0, 2)
        k = k.transpose(1, 0, 2)
        v = v.transpose(1, 0, 2)
        cs = cos[None].astype(jnp.float32)
        sn = sin[None].astype(jnp.float32)
        q = (q.astype(jnp.float32) * cs
             + _rotate_half(q.astype(jnp.float32)) * sn).astype(x.dtype)
        k = (k.astype(jnp.float32) * cs
             + _rotate_half(k.astype(jnp.float32)) * sn).astype(x.dtype)
        attn = jnp.einsum("hqd,hkd->hqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn * (hd ** -0.5), -1).astype(x.dtype)
        o = jnp.einsum("hqk,hkd->hqd", attn, v)
        o = o.transpose(1, 0, 2).reshape(t, d)
        x = x + nn.Dense(d, dtype=x.dtype, name="attn.proj")(o)
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=x.dtype, name="norm2")(x)
        h = nn.Dense(c.ffn, dtype=x.dtype, name="mlp.linear_fc1")(h)
        h = jax.nn.gelu(h, approximate=True)       # gelu_pytorch_tanh
        h = nn.Dense(d, dtype=x.dtype, name="mlp.linear_fc2")(h)
        return x + h


class OvisVisionModel(nn.Module):
    """(T, 3·p²) merge-block-ordered patches + interpolated pos rows →
    merger (norm → group merge² → fc1 gelu_erf → fc2) (ovisocr2/vision.rs
    :385-530)."""

    cfg: OvisVisionConfig

    @nn.compact
    def __call__(self, patches, pos_embed, cos, sin):
        c = self.cfg
        x = nn.Dense(c.hidden, use_bias=False, dtype=patches.dtype,
                     name="patch_embed.proj")(patches)
        # pos_embed table lives under its checkpoint name; rows arrive
        # host-interpolated in the same merge-block order as the patches
        self.param("pos_embed.weight", nn.initializers.normal(0.02),
                   (c.num_positions, c.hidden))
        x = x + pos_embed.astype(x.dtype)
        for i in range(c.depth):
            x = OvisVisionBlock(c, name=f"blocks.{i}")(x, cos, sin)
        g = c.merge ** 2
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=x.dtype,
                         name="merger.norm")(x)
        x = x.reshape(x.shape[0] // g, g * c.hidden)
        x = nn.Dense(g * c.hidden, dtype=x.dtype,
                     name="merger.linear_fc1")(x)
        x = jax.nn.gelu(x, approximate=False)      # gelu_erf
        return nn.Dense(c.out_hidden, dtype=x.dtype,
                        name="merger.linear_fc2")(x)


# --------------------------- MonkeyOCRv2 (Monkey ViT) ---------------------

@dataclass(frozen=True)
class MonkeyVisionConfig:
    """monkeyocrv2/vision.rs MonkeyOcrV2VisionConfig."""

    embed_dim: int = 1152
    heads: int = 16
    ffn: int = 4304
    depth: int = 27
    patch: int = 14
    merge: int = 2
    out_hidden: int = 1024           # llm hidden (merger.mlp.2 out)
    rms_eps: float = 1e-6
    rope_theta: float = 10000.0
    post_trunk_norm: bool = True

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.heads

    def tiny(self) -> "MonkeyVisionConfig":
        return dataclasses.replace(self, embed_dim=32, heads=4, ffn=64,
                                   depth=2, patch=4, out_hidden=48)


class MonkeyVisionBlock(nn.Module):
    """RMS norms + bias-free fused qkv/proj + SwiGLU fc1(gate)/fc3(up)/
    fc2(down) (monkeyocrv2/vision.rs:65-270)."""

    cfg: MonkeyVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin):
        c = self.cfg
        t, d = x.shape
        hd = c.head_dim
        h = _TowersRMSNorm(eps=c.rms_eps, name="norm1")(x)
        qkv = nn.Dense(3 * d, use_bias=False, dtype=x.dtype,
                       name="attn.qkv")(h)
        qkv = qkv.reshape(t, 3, c.heads, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = q.transpose(1, 0, 2)
        k = k.transpose(1, 0, 2)
        v = v.transpose(1, 0, 2)
        cs = cos[None].astype(jnp.float32)
        sn = sin[None].astype(jnp.float32)
        q = (q.astype(jnp.float32) * cs
             + _rotate_half(q.astype(jnp.float32)) * sn).astype(x.dtype)
        k = (k.astype(jnp.float32) * cs
             + _rotate_half(k.astype(jnp.float32)) * sn).astype(x.dtype)
        attn = jnp.einsum("hqd,hkd->hqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn * (hd ** -0.5), -1).astype(x.dtype)
        o = jnp.einsum("hqk,hkd->hqd", attn, v)
        o = o.transpose(1, 0, 2).reshape(t, d)
        x = x + nn.Dense(d, use_bias=False, dtype=x.dtype,
                         name="attn.proj")(o)
        h = _TowersRMSNorm(eps=c.rms_eps, name="norm2")(x)
        gate = nn.Dense(c.ffn, use_bias=False, dtype=x.dtype,
                        name="mlp.fc1")(h)
        up = nn.Dense(c.ffn, use_bias=False, dtype=x.dtype,
                      name="mlp.fc3")(h)
        h = nn.Dense(d, use_bias=False, dtype=x.dtype,
                     name="mlp.fc2")(jax.nn.silu(gate) * up)
        return x + h


class MonkeyVisionModel(nn.Module):
    """patch_embed.patchifier (proj + RMS norm) → blocks →
    post_trunk_norm → merger (ln_q LN → group merge² → mlp.0 gelu_erf →
    mlp.2) (monkeyocrv2/vision.rs:335-420)."""

    cfg: MonkeyVisionConfig

    @nn.compact
    def __call__(self, patches, cos, sin):
        c = self.cfg
        x = nn.Dense(c.embed_dim, use_bias=True, dtype=patches.dtype,
                     name="patch_embed.patchifier.proj")(patches)
        x = _TowersRMSNorm(eps=c.rms_eps,
                           name="patch_embed.patchifier.norm")(x)
        for i in range(c.depth):
            x = MonkeyVisionBlock(c, name=f"blocks.{i}")(x, cos, sin)
        if c.post_trunk_norm:
            x = _TowersRMSNorm(eps=c.rms_eps, name="post_trunk_norm")(x)
        g = c.merge ** 2
        x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype,
                         name="merger.ln_q")(x)
        x = x.reshape(x.shape[0] // g, g * c.embed_dim)
        x = nn.Dense(g * c.embed_dim, dtype=x.dtype,
                     name="merger.mlp.0")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(c.out_hidden, dtype=x.dtype,
                        name="merger.mlp.2")(x)

"""Exact SLANeXt: Vary-ViT-B (SAM ViT encoder) + SLAHead at official names.

The reference executes SLANeXt_wired / SLANeXt_wireless as opaque ONNX
graphs (oar-ocr-core/src/models/recognition/slanet.rs:38-235; input
presets core/config/model_input.rs:322-360 — wired 512x512, wireless
488x488, BGR + ImageNet; family detection predictors/
table_structure_recognition.rs:36-58).  This module reconstructs the
architecture those graphs were exported from — PaddleOCR's SLANeXt:
``Vary_VIT_B`` backbone = SAM ViT-B image encoder (patch 16, embed 768,
depth 12, heads 12, decomposed relative-position attention, window 14
with global blocks [2,5,8,11], 256-channel conv neck) + Vary's extra
stride-2 ``net_2`` conv, feeding the same SLAHead structure decoder as
SLANet but with hidden_size 512 over the 512-channel feature map.

Dim pinning by byte arithmetic on the published export (367,743,373
bytes ≈ 91.9M f32 params; docs/models.md:176-177): trunk 87.27M +
net_2 1.18M + SLAHead(in 512, hidden 512) 2.73M = 91.19M.  The full
Vary tower (net_3 → 1024 channels + 1024×1024 projector) would be ~98M
(392 MB) and does not fit the file size, so the export stops at net_2
with 512 output channels — re-validate against the real checkpoint
tensor list at conversion time (same caveat as the PicoDet/-FormulaNet
dim tables, docs/ROADMAP.md).

Flax module names mirror the Paddle attribute paths 1:1 so the
``runtime/ppocr_maps.build_ppocr_map`` walker emits official checkpoint
names (``backbone.vision_tower_high.blocks.0.attn.qkv.weight`` ...);
parity vs tools/torch_ref_slanext.py in tests/test_slanext_parity.py.

TPU notes: every shape is static (fixed square canvas per family), the
12 attention blocks are plain batched matmuls that tile onto the MXU,
window partition is a reshape/transpose XLA fuses away, and the
autoregressive head reuses SLAHeadExact's all-EOS early-exit
``nn.while_loop`` in f32.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...runtime.runtime import Runtime, init_params
from .slanet import TABLE_STRUCTURE_VOCAB
from .slanet_exact import SLAHeadExact, SLANetExactModel


class LayerNorm2d(nn.Module):
    """SAM neck LayerNorm over the channel axis (input NHWC here)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        u = jnp.mean(x32, -1, keepdims=True)
        s = jnp.mean((x32 - u) ** 2, -1, keepdims=True)
        y = (x32 - u) / jnp.sqrt(s + 1e-6)
        return (scale * y + bias).astype(x.dtype)


def _get_rel_pos(size: int, rel_pos):
    """Decomposed rel-pos table for q_size == k_size == size, with the
    SAM linear re-interpolation when the stored length ≠ 2·size−1
    (the 488-px wireless grid is 30 vs the 32 the table was trained at).
    Indices are static — resolved at trace time."""
    max_rel_dist = 2 * size - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32),
            (max_rel_dist, rel_pos.shape[1]), method="linear",
            antialias=False)
    idx = (np.arange(size)[:, None] - np.arange(size)[None, :]
           + size - 1)
    return rel_pos[idx]


class SAMAttention(nn.Module):
    """SAM windowed attention with decomposed relative positions."""

    dim: int
    heads: int
    table_size: int     # stored rel-pos table covers 2*table_size-1

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, dtype=x.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(
            3, b * self.heads, h * w, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (hd ** -0.5)) @ k.transpose(0, 2, 1)

        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.table_size - 1, hd))
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.table_size - 1, hd))
        Rh = _get_rel_pos(h, rel_pos_h).astype(q.dtype)
        Rw = _get_rel_pos(w, rel_pos_w).astype(q.dtype)
        r_q = q.reshape(-1, h, w, hd)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
        attn = attn + (rel_h[:, :, :, :, None]
                       + rel_w[:, :, :, None, :]).reshape(
                           -1, h * w, h * w)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
        out = (attn @ v).reshape(b, self.heads, h, w, hd)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=x.dtype, name="proj")(out)


def _window_partition(x, ws: int):
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c),
            (hp, wp))


def _window_unpartition(windows, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // ws // ws)
    x = windows.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class MLPBlock(nn.Module):
    dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, dtype=x.dtype, name="lin1")(x)
        x = jax.nn.gelu(x, approximate=False)   # SAM uses exact GELU
        return nn.Dense(self.dim, dtype=x.dtype, name="lin2")(x)


class SAMBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float
    window: int         # 0 = global attention
    global_table: int   # stored rel-pos grid for global blocks

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm1")(x)
        if self.window > 0:
            h, w = y.shape[1], y.shape[2]
            y, pad_hw = _window_partition(y, self.window)
            y = SAMAttention(self.dim, self.heads, self.window,
                             name="attn")(y)
            y = _window_unpartition(y, self.window, pad_hw, (h, w))
        else:
            y = SAMAttention(self.dim, self.heads, self.global_table,
                             name="attn")(y)
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm2")(x)
        return x + MLPBlock(self.dim, int(self.dim * self.mlp_ratio),
                            name="mlp")(z)


class ImageEncoderViT(nn.Module):
    """SAM ViT encoder + Vary net_2 tail; input NHWC, output NHWC at
    stride 32 with net2_out channels."""

    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window: int = 14
    global_idx: Tuple[int, ...] = (2, 5, 8, 11)
    net2_out: int = 512
    net3_out: int = 0       # Vary's full tower (PP-FormulaNet-L); 0 = absent
    pos_grid: int = 32      # pos-embed grid the checkpoint was trained at

    @nn.compact
    def __call__(self, x):
        p = self.patch
        x = nn.Conv(self.dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=x.dtype, name="patch_embed.proj")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.pos_grid, self.pos_grid, self.dim))
        if pos.shape[1:3] != x.shape[1:3]:
            pos = jax.image.resize(
                pos.astype(jnp.float32),
                (1, x.shape[1], x.shape[2], self.dim), method="linear",
                antialias=False)
        x = x + pos.astype(x.dtype)
        # global blocks attend over the full grid; their stored table
        # covers the training grid (pos_grid) and re-interpolates when
        # the runtime grid differs (488-px wireless → 30×30).
        for i in range(self.depth):
            win = 0 if i in self.global_idx else self.window
            x = SAMBlock(self.dim, self.heads, self.mlp_ratio, win,
                         self.pos_grid, name=f"blocks.{i}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False,
                    dtype=x.dtype, name="neck.0")(x)
        x = LayerNorm2d(name="neck.1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=x.dtype, name="neck.2")(x)
        x = LayerNorm2d(name="neck.3")(x)
        x = nn.Conv(self.net2_out, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=x.dtype, name="net_2")(x)
        if self.net3_out:
            x = nn.Conv(self.net3_out, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=x.dtype, name="net_3")(x)
        return x


class VaryVITB(nn.Module):
    """Vary_VIT_B backbone (attribute name vision_tower_high as in the
    Vary / PaddleOCR port).  With ``projector=True`` the stride-64 map
    is flattened to a sequence through ``mm_projector_vary`` — the
    PP-FormulaNet-L encoder shape."""

    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    out_chans: int = 256
    window: int = 14
    global_idx: Tuple[int, ...] = (2, 5, 8, 11)
    net2_out: int = 512
    net3_out: int = 0
    pos_grid: int = 32
    projector: bool = False

    @nn.compact
    def __call__(self, x):
        x = ImageEncoderViT(
            patch=self.patch, dim=self.dim, depth=self.depth,
            heads=self.heads, out_chans=self.out_chans,
            window=self.window, global_idx=self.global_idx,
            net2_out=self.net2_out, net3_out=self.net3_out,
            pos_grid=self.pos_grid, name="vision_tower_high")(x)
        if not self.projector:
            return x
        b, h, w, c = x.shape
        return nn.Dense(c, dtype=x.dtype,
                        name="mm_projector_vary")(x.reshape(b, h * w, c))


class SLANeXtExact(nn.Module):
    """backbone → head at the checkpoint roots; input (N, S, S, 3)
    normalized BGR; returns ((N, T, vocab) logits, (N, T, loc))."""

    vocab_size: int = len(TABLE_STRUCTURE_VOCAB)
    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    out_chans: int = 256
    window: int = 14
    global_idx: Tuple[int, ...] = (2, 5, 8, 11)
    net2_out: int = 512
    pos_grid: int = 32
    hidden_size: int = 512
    max_text_length: int = 500
    loc_reg_num: int = 8

    @nn.compact
    def __call__(self, x):
        fea = VaryVITB(patch=self.patch, dim=self.dim, depth=self.depth,
                       heads=self.heads, out_chans=self.out_chans,
                       window=self.window, global_idx=self.global_idx,
                       net2_out=self.net2_out, pos_grid=self.pos_grid,
                       name="backbone")(x)
        return SLAHeadExact(self.vocab_size, self.hidden_size,
                            self.max_text_length, self.loc_reg_num,
                            name="head")(fea)


def build_slanext_map(params, *, name: str = "slanext"):
    """Official-name ConversionMap (same walker as SLANet/det/rec)."""
    from ...runtime.ppocr_maps import build_ppocr_map

    return build_ppocr_map(params, name=name)


class SLANeXtExactModel(SLANetExactModel):
    """Keep-ratio square-pad driver around SLANeXtExact (the padded
    input is square for SLANeXt — table_structure_decode.rs:691; wired
    512, wireless 488).  Inherits the device sampling path and decode
    from SLANetExactModel."""

    def __init__(self, params=None, *, input_size: int = 512,
                 max_text_length: int = 500, loc_reg_num: int = 8,
                 runtime: Optional[Runtime] = None, seed: int = 0,
                 **model_kw):
        self.INPUT = input_size
        self.runtime = runtime or Runtime.default()
        self.model = SLANeXtExact(max_text_length=max_text_length,
                                  loc_reg_num=loc_reg_num, **model_kw)
        if params is None:
            params = init_params(
                self.model, (1, self.INPUT, self.INPUT, 3),
                dtype=jnp.float32, seed=seed)
        self.params = jax.device_put(params, self.runtime.device)
        self._fwd = jax.jit(self.model.apply)

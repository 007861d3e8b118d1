"""Torch golden-reference HunyuanOCR (vision tower + XDRoPE decoder).

Independent executable statement of oar-ocr-vl/src/hunyuanocr/ whose
state_dict keys (after torch_ref_vl.hf_state_dict's Linear transpose) are
the HF checkpoint names (``vit.embeddings.patch_embedding.weight``,
``model.layers.0.self_attn.query_layernorm.weight``, …). The XDRoPE here
implements select_rope_sections literally (attention.rs:906-960: doubled
sections over the full head_dim cos/sin) as an independent check of the
repo's mrope-style half-split mix.

CPU-only torch; never imported by the package itself.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tools.torch_ref_vl import hf_state_dict, seed_all  # noqa: F401


class TorchRMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype) \
            * self.weight


class HyVisionLayer(nn.Module):
    def __init__(self, dim, heads, ffn, eps):
        super().__init__()
        self.input_layernorm = nn.LayerNorm(dim, eps=eps)
        self.post_attention_layernorm = nn.LayerNorm(dim, eps=eps)
        self.self_attn = nn.ModuleDict({
            "q_proj": nn.Linear(dim, dim),
            "k_proj": nn.Linear(dim, dim),
            "v_proj": nn.Linear(dim, dim),
            "o_proj": nn.Linear(dim, dim),
        })
        self.mlp = nn.ModuleDict({
            "dense_h_to_4h": nn.Linear(dim, ffn),
            "dense_4h_to_h": nn.Linear(ffn, dim),
        })
        self.heads = heads

    def forward(self, x):
        b, t, d = x.shape
        hd = d // self.heads
        h = self.input_layernorm(x)
        q = self.self_attn["q_proj"](h).reshape(b, t, self.heads, hd
                                                ).transpose(1, 2)
        k = self.self_attn["k_proj"](h).reshape(b, t, self.heads, hd
                                                ).transpose(1, 2)
        v = self.self_attn["v_proj"](h).reshape(b, t, self.heads, hd
                                                ).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, t, d)
        x = x + self.self_attn["o_proj"](o)
        h = self.post_attention_layernorm(x)
        h = self.mlp["dense_4h_to_h"](
            F.gelu(self.mlp["dense_h_to_4h"](h), approximate="none"))
        return x + h


class HyPerceive(nn.Module):
    def __init__(self, v_dim, merge, hidden, eps):
        super().__init__()
        md = merge * merge * v_dim
        self.before_rms = TorchRMSNorm(v_dim, eps)
        self.proj = nn.ModuleDict({
            "0": nn.Conv2d(v_dim, md, merge, stride=merge),
            "2": nn.Conv2d(md, md, 1),
        })
        self.mlp = nn.Linear(md, hidden)
        self.after_rms = TorchRMSNorm(hidden, eps)
        self.image_begin = nn.Parameter(torch.randn(hidden) * 0.02)
        self.image_end = nn.Parameter(torch.randn(hidden) * 0.02)
        self.image_newline = nn.Parameter(torch.randn(md) * 0.02)
        self.merge = merge
        self.md = md

    def forward(self, tokens, h, w):
        x = self.before_rms(tokens)                  # (T, v_dim)
        d = x.shape[-1]
        fm = x.reshape(h, w, d).permute(2, 0, 1).unsqueeze(0)
        feat = self.proj["0"](fm)
        feat = F.gelu(feat, approximate="none")
        feat = self.proj["2"](feat)
        _, c, h2, w2 = feat.shape
        nl = self.image_newline.reshape(1, self.md, 1, 1).expand(
            1, self.md, h2, 1)
        feat = torch.cat([feat, nl], dim=3)
        tokens = feat.permute(0, 2, 3, 1).reshape(h2 * (w2 + 1), self.md)
        tokens = self.mlp(tokens)
        cat = torch.cat([self.image_begin[None], tokens,
                         self.image_end[None]], dim=0)
        return self.after_rms(cat)


class HyVisionModel(nn.Module):
    def __init__(self, dim=32, heads=4, ffn=64, layers=2, patch=4,
                 merge=2, hidden=64, grid=8, eps=1e-5):
        super().__init__()
        self.embeddings = nn.ModuleDict({
            "patch_embedding": nn.Conv2d(3, dim, patch, stride=patch),
            "position_embedding": nn.Embedding(grid * grid + 1, dim),
        })
        self.layers = nn.ModuleList(
            [HyVisionLayer(dim, heads, ffn, eps) for _ in range(layers)])
        self.perceive = HyPerceive(dim, merge, hidden, eps)
        self.patch = patch
        self.grid = grid

    def interpolate_pos(self, h, w):
        base = self.embeddings["position_embedding"].weight[1:]
        g = self.grid
        d = base.shape[-1]
        src = base.reshape(1, g, g, d).permute(0, 3, 1, 2)
        out = F.interpolate(src, size=(h, w), mode="bilinear",
                            align_corners=False)
        return out.permute(0, 2, 3, 1).reshape(h * w, d)

    def forward(self, pixel_values):
        _, _, rh, rw = pixel_values.shape
        h, w = rh // self.patch, rw // self.patch
        patches = self.embeddings["patch_embedding"](pixel_values)
        x = patches.squeeze(0).permute(1, 2, 0).reshape(1, h * w, -1)
        x = x + self.interpolate_pos(h, w)[None]
        for layer in self.layers:
            x = layer(x)
        return self.perceive(x[0], h, w)


def select_rope_sections(cos_or_sin: torch.Tensor,
                         sections: Sequence[int]) -> torch.Tensor:
    """attention.rs:906 — cos/sin (A, B, T, head_dim); doubled sections
    pick axis a for its band in each half."""
    doubled = list(sections) + list(sections)
    parts = []
    offset = 0
    for i, width in enumerate(doubled):
        axis = i % len(sections)
        parts.append(cos_or_sin[axis, :, :, offset:offset + width])
        offset += width
    return torch.cat(parts, dim=-1)


def rotate_half(x):
    d2 = x.shape[-1] // 2
    return torch.cat([-x[..., d2:], x[..., :d2]], dim=-1)


class HyDecoderLayer(nn.Module):
    def __init__(self, hidden, heads, kv_heads, head_dim, ffn, eps,
                 use_qk_norm=True):
        super().__init__()
        self.input_layernorm = TorchRMSNorm(hidden, eps)
        self.post_attention_layernorm = TorchRMSNorm(hidden, eps)
        self.self_attn = nn.ModuleDict({
            "q_proj": nn.Linear(hidden, heads * head_dim, bias=False),
            "k_proj": nn.Linear(hidden, kv_heads * head_dim, bias=False),
            "v_proj": nn.Linear(hidden, kv_heads * head_dim, bias=False),
            "o_proj": nn.Linear(heads * head_dim, hidden, bias=False),
        })
        if use_qk_norm:
            self.self_attn["query_layernorm"] = TorchRMSNorm(head_dim, eps)
            self.self_attn["key_layernorm"] = TorchRMSNorm(head_dim, eps)
        self.mlp = nn.ModuleDict({
            "gate_proj": nn.Linear(hidden, ffn, bias=False),
            "up_proj": nn.Linear(hidden, ffn, bias=False),
            "down_proj": nn.Linear(ffn, hidden, bias=False),
        })
        self.heads, self.kv_heads, self.head_dim = heads, kv_heads, head_dim
        self.use_qk_norm = use_qk_norm

    def forward(self, x, cos, sin, causal=True):
        b, t, _ = x.shape
        h = self.input_layernorm(x)
        q = self.self_attn["q_proj"](h).reshape(b, t, self.heads,
                                                self.head_dim)
        k = self.self_attn["k_proj"](h).reshape(b, t, self.kv_heads,
                                                self.head_dim)
        v = self.self_attn["v_proj"](h).reshape(b, t, self.kv_heads,
                                                self.head_dim)
        if self.use_qk_norm:
            q = self.self_attn["query_layernorm"](q)
            k = self.self_attn["key_layernorm"](k)
        q = q.transpose(1, 2).float()
        k = k.transpose(1, 2).float()
        v = v.transpose(1, 2).float()
        q = q * cos[:, None] + rotate_half(q) * sin[:, None]
        k = k * cos[:, None] + rotate_half(k) * sin[:, None]
        g = self.heads // self.kv_heads
        k = k.repeat_interleave(g, dim=1)
        v = v.repeat_interleave(g, dim=1)
        o = F.scaled_dot_product_attention(q, k, v, is_causal=causal)
        o = o.transpose(1, 2).reshape(b, t, self.heads * self.head_dim)
        x = x + self.self_attn["o_proj"](o.to(x.dtype))
        h = self.post_attention_layernorm(x)
        h = self.mlp["down_proj"](F.silu(self.mlp["gate_proj"](h))
                                  * self.mlp["up_proj"](h))
        return x + h


class HyModel(nn.Module):
    """model.* subtree: embed_tokens + layers + norm; tied LM head."""

    def __init__(self, vocab=512, hidden=64, layers=2, heads=4, kv_heads=2,
                 head_dim=16, ffn=128, eps=1e-5, theta=10000.0,
                 sections=(4, 2, 2)):
        super().__init__()
        self.embed_tokens = nn.Embedding(vocab, hidden)
        self.layers = nn.ModuleList(
            [HyDecoderLayer(hidden, heads, kv_heads, head_dim, ffn, eps)
             for _ in range(layers)])
        self.norm = TorchRMSNorm(hidden, eps)
        self.head_dim, self.theta = head_dim, theta
        self.sections = sections

    def xdrope_tables(self, position_ids):
        """position_ids (3, B, T) → cos/sin (B, T, head_dim) via the
        literal doubled-section mix."""
        inv = 1.0 / (self.theta ** (
            torch.arange(0, self.head_dim, 2, dtype=torch.float32)
            / self.head_dim))
        freqs = position_ids[..., None].float() * inv      # (3,B,T,hd/2)
        emb = torch.cat([freqs, freqs], dim=-1)            # (3,B,T,hd)
        return (select_rope_sections(emb.cos(), self.sections),
                select_rope_sections(emb.sin(), self.sections))

    def forward(self, embeds, position_ids):
        cos, sin = self.xdrope_tables(position_ids)
        x = embeds
        for layer in self.layers:
            x = layer(x, cos, sin)
        x = self.norm(x)
        return x.float() @ self.embed_tokens.weight.float().T


class HunyuanOCRTorch(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        vk = {k[2:]: v for k, v in kw.items() if k.startswith("v_")}
        tk = {k: v for k, v in kw.items() if not k.startswith("v_")}
        self.vit = HyVisionModel(hidden=tk.get("hidden", 64), **vk)
        self.model = HyModel(**tk)

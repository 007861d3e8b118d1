"""Torch golden reference for PaddleOCR-VL (HF checkpoint semantics).

Independent re-statement of the HF modeling code the reference binds to
(oar-ocr-vl/src/paddleocr_vl/vision.rs, ernie.rs, projector.rs), with
``state_dict()`` keys equal to the checkpoint's tensor names. Used by
tests/test_vl_golden_parity.py exactly like tools/torch_ref.py is used
for det/rec: the state dict IS the conversion fixture, and the forward
defines expected numerics (2-D vision rope, interpolated position
embedding, gelu-erf projector with 2×2 merge, Ernie GQA with explicit
head_dim and 3-D MRoPE).

Operates on whole images (Conv2d patch embedding, raster token order,
merge in the projector) — the flax side operates on host-flattened
patches in block order, so parity across the two proves the host
packing + weight-permutation story end to end.

CPU-only torch; never imported by the package itself.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def rotate_half(x):
    d = x.shape[-1] // 2
    return torch.cat([-x[..., d:], x[..., :d]], dim=-1)


class VisionAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.q_proj = nn.Linear(dim, dim)
        self.k_proj = nn.Linear(dim, dim)
        self.v_proj = nn.Linear(dim, dim)
        self.out_proj = nn.Linear(dim, dim)

    def forward(self, x, cos, sin):
        b, t, d = x.shape
        shp = (b, t, self.heads, self.head_dim)
        q = self.q_proj(x).reshape(shp).transpose(1, 2)
        k = self.k_proj(x).reshape(shp).transpose(1, 2)
        v = self.v_proj(x).reshape(shp).transpose(1, 2)
        q = q * cos + rotate_half(q) * sin
        k = k * cos + rotate_half(k) * sin
        attn = (q @ k.transpose(-2, -1)) * self.head_dim ** -0.5
        attn = attn.softmax(-1)
        o = (attn @ v).transpose(1, 2).reshape(b, t, d)
        return self.out_proj(o)


class VisionMlp(nn.Module):
    def __init__(self, dim, ffn):
        super().__init__()
        self.fc1 = nn.Linear(dim, ffn)
        self.fc2 = nn.Linear(ffn, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x), approximate="tanh"))


class VisionLayer(nn.Module):
    def __init__(self, dim, heads, ffn, eps):
        super().__init__()
        self.layer_norm1 = nn.LayerNorm(dim, eps=eps)
        self.self_attn = VisionAttention(dim, heads)
        self.layer_norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = VisionMlp(dim, ffn)

    def forward(self, x, cos, sin):
        x = x + self.self_attn(self.layer_norm1(x), cos, sin)
        return x + self.mlp(self.layer_norm2(x))


class VisionEmbeddings(nn.Module):
    def __init__(self, dim, patch, grid):
        super().__init__()
        self.patch_embedding = nn.Conv2d(3, dim, patch, patch)
        self.position_embedding = nn.Embedding(grid * grid, dim)

    def interpolated(self, gh, gw):
        w = self.position_embedding.weight
        n, d = w.shape
        g = int(round(n ** 0.5))
        grid = w.reshape(1, g, g, d).permute(0, 3, 1, 2)
        out = F.interpolate(grid, size=(gh, gw), mode="bilinear",
                            align_corners=False)
        return out.permute(0, 2, 3, 1).reshape(gh * gw, d)


class VisionModel(nn.Module):
    """visual.vision_model."""

    def __init__(self, dim, heads, ffn, layers, patch, grid, eps=1e-6):
        super().__init__()
        self.embeddings = VisionEmbeddings(dim, patch, grid)
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            [VisionLayer(dim, heads, ffn, eps) for _ in range(layers)])
        self.post_layernorm = nn.LayerNorm(dim, eps=eps)
        self.head_dim = dim // heads

    def forward(self, image):
        """image (1, 3, H, W) → (T, dim) raster-order tokens."""
        x = self.embeddings.patch_embedding(image)     # (1, D, gh, gw)
        _, d, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)               # (1, T, D)
        x = x + self.embeddings.interpolated(gh, gw)[None]
        # 2-D rope (vision.rs VisionModel.forward)
        quarter = self.head_dim // 4
        inv = 1.0 / (10000.0 ** (torch.arange(quarter).float() / quarter))
        hh = torch.arange(gh).repeat_interleave(gw).float()
        ww = torch.arange(gw).repeat(gh).float()
        freqs = torch.cat([hh[:, None] * inv, ww[:, None] * inv], -1)
        emb = torch.cat([freqs, freqs], -1)            # (T, head_dim)
        cos = emb.cos()[None, None]
        sin = emb.sin()[None, None]
        for layer in self.encoder.layers:
            x = layer(x, cos, sin)
        return self.post_layernorm(x)[0], (gh, gw)


class Projector(nn.Module):
    """mlp_AR."""

    def __init__(self, v_dim, hidden, merge, eps=1e-6):
        super().__init__()
        self.merge = merge
        big = v_dim * merge * merge
        self.pre_norm = nn.LayerNorm(v_dim, eps=eps)
        self.linear_1 = nn.Linear(big, big)
        self.linear_2 = nn.Linear(big, hidden)

    def forward(self, feat, gh, gw):
        m = self.merge
        d = feat.shape[-1]
        feat = self.pre_norm(feat)
        feat = feat.reshape(gh // m, m, gw // m, m, d)
        feat = feat.permute(0, 2, 1, 3, 4).reshape(-1, m * m * d)
        return self.linear_2(F.gelu(self.linear_1(feat)))


class ErnieAttention(nn.Module):
    def __init__(self, hidden, heads, kv_heads, head_dim, use_bias):
        super().__init__()
        self.heads, self.kv_heads, self.head_dim = heads, kv_heads, head_dim
        self.q_proj = nn.Linear(hidden, heads * head_dim, bias=use_bias)
        self.k_proj = nn.Linear(hidden, kv_heads * head_dim, bias=use_bias)
        self.v_proj = nn.Linear(hidden, kv_heads * head_dim, bias=use_bias)
        self.o_proj = nn.Linear(heads * head_dim, hidden, bias=use_bias)

    def forward(self, x, cos, sin, causal=True):
        b, t, _ = x.shape
        q = self.q_proj(x).reshape(b, t, self.heads, self.head_dim
                                   ).transpose(1, 2)
        k = self.k_proj(x).reshape(b, t, self.kv_heads, self.head_dim
                                   ).transpose(1, 2)
        v = self.v_proj(x).reshape(b, t, self.kv_heads, self.head_dim
                                   ).transpose(1, 2)
        q = q * cos + rotate_half(q) * sin
        k = k * cos + rotate_half(k) * sin
        rep = self.heads // self.kv_heads
        k = k.repeat_interleave(rep, dim=1)
        v = v.repeat_interleave(rep, dim=1)
        attn = (q @ k.transpose(-2, -1)) * self.head_dim ** -0.5
        if causal:
            mask = torch.full((t, t), float("-inf")).triu(1)
            attn = attn + mask
        o = (attn.softmax(-1) @ v).transpose(1, 2).reshape(
            b, t, self.heads * self.head_dim)
        return self.o_proj(o)


class ErnieMlp(nn.Module):
    def __init__(self, hidden, ffn, use_bias):
        super().__init__()
        self.gate_proj = nn.Linear(hidden, ffn, bias=use_bias)
        self.up_proj = nn.Linear(hidden, ffn, bias=use_bias)
        self.down_proj = nn.Linear(ffn, hidden, bias=use_bias)

    def forward(self, x):
        return self.down_proj(F.silu(self.gate_proj(x)) * self.up_proj(x))


class TorchRMSNorm(nn.Module):
    def __init__(self, dim, eps):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x * torch.rsqrt(var + self.eps)) * self.weight


class ErnieLayer(nn.Module):
    def __init__(self, hidden, heads, kv, head_dim, ffn, use_bias, eps):
        super().__init__()
        self.self_attn = ErnieAttention(hidden, heads, kv, head_dim,
                                        use_bias)
        self.mlp = ErnieMlp(hidden, ffn, use_bias)
        self.input_layernorm = TorchRMSNorm(hidden, eps)
        self.post_attention_layernorm = TorchRMSNorm(hidden, eps)

    def forward(self, x, cos, sin):
        x = x + self.self_attn(self.input_layernorm(x), cos, sin)
        return x + self.mlp(self.post_attention_layernorm(x))


class ErnieModel(nn.Module):
    """model.*"""

    def __init__(self, vocab, hidden, layers, heads, kv, head_dim, ffn,
                 use_bias, eps):
        super().__init__()
        self.embed_tokens = nn.Embedding(vocab, hidden)
        self.layers = nn.ModuleList([
            ErnieLayer(hidden, heads, kv, head_dim, ffn, use_bias, eps)
            for _ in range(layers)])
        self.norm = TorchRMSNorm(hidden, eps)


class PaddleOCRVLTorch(nn.Module):
    """Top-level module whose state_dict keys are the checkpoint names."""

    def __init__(self, *, vocab=512, hidden=128, layers=2, heads=4, kv=2,
                 head_dim=32, ffn=256, use_bias=False, rms_eps=1e-5,
                 theta=500000.0, mrope=(8, 4, 4),
                 v_dim=64, v_ffn=128, v_layers=2, v_heads=4, v_patch=14,
                 v_merge=2, v_grid=4):
        super().__init__()
        self.visual = nn.Module()
        self.visual.vision_model = VisionModel(
            v_dim, v_heads, v_ffn, v_layers, v_patch, v_grid)
        self.mlp_AR = Projector(v_dim, hidden, v_merge)
        self.model = ErnieModel(vocab, hidden, layers, heads, kv, head_dim,
                                ffn, use_bias, rms_eps)
        self.lm_head = nn.Linear(hidden, vocab, bias=False)
        self.theta = theta
        self.mrope = mrope
        self.head_dim = head_dim

    def mrope_cos_sin(self, position_ids):
        """position_ids (3, 1, T) → cos/sin (1, 1, T, head_dim)."""
        half = self.head_dim // 2
        inv = 1.0 / (self.theta ** (torch.arange(half).float() / half))
        freqs = position_ids[..., None].float() * inv   # (3, 1, T, half)
        parts = []
        start = 0
        for axis, width in enumerate(self.mrope):
            parts.append(freqs[axis, ..., start:start + width])
            start += width
        f = torch.cat(parts, -1)                         # (1, T, half)
        emb = torch.cat([f, f], -1)                      # (1, T, head_dim)
        return emb.cos()[:, None], emb.sin()[:, None]

    def forward_text(self, ids, position_ids):
        """Full-prompt causal forward → logits (1, T, vocab)."""
        cos, sin = self.mrope_cos_sin(position_ids)
        x = self.model.embed_tokens(ids)
        for layer in self.model.layers:
            x = layer(x, cos, sin)
        return self.lm_head(self.model.norm(x))

    def encode_image(self, image):
        feat, (gh, gw) = self.visual.vision_model(image)
        return self.mlp_AR(feat, gh, gw), (gh, gw)


def hf_state_dict(model: nn.Module) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def seed_all(model: nn.Module, seed: int = 0) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    model.eval()

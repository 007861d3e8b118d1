"""Torch golden references for the MinerU (Qwen2-VL) and HPD (InternViT)
vision towers (oar-ocr-vl/src/mineru/vision.rs, hpd_parsing/vision.rs).

state_dict keys after torch_ref_vl.hf_state_dict's transpose are the HF
checkpoint names. CPU-only torch; never imported by the package itself.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tools.torch_ref_vl import hf_state_dict, seed_all  # noqa: F401


def rotate_half(x):
    d2 = x.shape[-1] // 2
    return torch.cat([-x[..., d2:], x[..., :d2]], dim=-1)


class MinerUBlock(nn.Module):
    def __init__(self, d, heads, ffn, eps=1e-6):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=eps)
        self.norm2 = nn.LayerNorm(d, eps=eps)
        self.attn = nn.ModuleDict({"qkv": nn.Linear(d, 3 * d),
                                   "proj": nn.Linear(d, d)})
        self.mlp = nn.ModuleDict({"fc1": nn.Linear(d, ffn),
                                  "fc2": nn.Linear(ffn, d)})
        self.heads = heads

    def forward(self, x, cos, sin):
        t, d = x.shape
        hd = d // self.heads
        h = self.norm1(x)
        qkv = self.attn["qkv"](h).reshape(t, 3, self.heads, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = q.transpose(0, 1)
        k = k.transpose(0, 1)
        v = v.transpose(0, 1)
        q = q * cos[None] + rotate_half(q) * sin[None]
        k = k * cos[None] + rotate_half(k) * sin[None]
        o = F.scaled_dot_product_attention(q[None], k[None], v[None])[0]
        o = o.transpose(0, 1).reshape(t, d)
        x = x + self.attn["proj"](o)
        h = self.norm2(x)
        h = self.mlp["fc1"](h)
        h = h * torch.sigmoid(1.702 * h)        # quick_gelu
        return x + self.mlp["fc2"](h)


class MinerUVisionTorch(nn.Module):
    def __init__(self, embed_dim=32, heads=4, layers=2, patch=4,
                 temporal_patch=1, merge=2, out_hidden=48,
                 theta=10000.0):
        super().__init__()
        patch_dim = 3 * temporal_patch * patch * patch
        ffn = embed_dim * 4
        self.patch_embed = nn.ModuleDict(
            {"proj": nn.Linear(patch_dim, embed_dim, bias=False)})
        self.blocks = nn.ModuleList(
            [MinerUBlock(embed_dim, heads, ffn) for _ in range(layers)])
        self.merger = nn.ModuleDict({
            "ln_q": nn.LayerNorm(embed_dim, eps=1e-6),
            "mlp": nn.ModuleDict({
                "0": nn.Linear(merge * merge * embed_dim,
                               merge * merge * embed_dim),
                "2": nn.Linear(merge * merge * embed_dim, out_hidden),
            }),
        })
        self.merge = merge
        self.head_dim = embed_dim // heads
        self.theta = theta

    def rope_tables(self, hpos, wpos):
        quarter = self.head_dim // 4
        inv = 1.0 / (self.theta ** (
            torch.arange(quarter, dtype=torch.float32) * 2
            / (self.head_dim // 2)))
        fh = hpos[:, None].float() * inv[None]
        fw = wpos[:, None].float() * inv[None]
        freqs = torch.cat([fh, fw], -1)
        emb = torch.cat([freqs, freqs], -1)
        return emb.cos(), emb.sin()

    def forward(self, patches, hpos, wpos):
        cos, sin = self.rope_tables(hpos, wpos)
        x = self.patch_embed["proj"](patches)
        for b in self.blocks:
            x = b(x, cos, sin)
        x = self.merger["ln_q"](x)
        g = self.merge ** 2
        x = x.reshape(x.shape[0] // g, -1)
        x = self.merger["mlp"]["0"](x)
        x = F.gelu(x, approximate="none")
        return self.merger["mlp"]["2"](x)


class InternBlockTorch(nn.Module):
    def __init__(self, d, heads, ffn, eps=1e-6, qkv_bias=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=eps)
        self.norm2 = nn.LayerNorm(d, eps=eps)
        self.attn = nn.ModuleDict({
            "qkv": nn.Linear(d, 3 * d, bias=qkv_bias),
            "proj": nn.Linear(d, d),
        })
        self.mlp = nn.ModuleDict({"fc1": nn.Linear(d, ffn),
                                  "fc2": nn.Linear(ffn, d)})
        self.ls1 = nn.Parameter(torch.ones(d))
        self.ls2 = nn.Parameter(torch.ones(d))
        self.heads = heads

    def forward(self, x):
        b, t, d = x.shape
        hd = d // self.heads
        h = self.norm1(x)
        qkv = self.attn["qkv"](h).reshape(b, t, 3, self.heads, hd)
        q = qkv[:, :, 0].transpose(1, 2)
        k = qkv[:, :, 1].transpose(1, 2)
        v = qkv[:, :, 2].transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, t, d)
        x = x + self.attn["proj"](o) * self.ls1
        h = self.norm2(x)
        h = self.mlp["fc2"](F.gelu(self.mlp["fc1"](h), approximate="none"))
        return x + h * self.ls2


class HpdVisionTorch(nn.Module):
    def __init__(self, hidden=32, ffn=64, layers=2, heads=4, image_size=32,
                 patch=4, llm_hidden=48, downsample=2):
        super().__init__()
        g = image_size // patch
        patch_dim = 3 * patch * patch

        class Emb(nn.Module):
            def __init__(self):
                super().__init__()
                self.patch_embedding = nn.Linear(patch_dim, hidden)
                self.class_embedding = nn.Parameter(
                    torch.randn(1, 1, hidden) * 0.02)
                self.position_embedding = nn.Parameter(
                    torch.randn(1, g * g + 1, hidden) * 0.02)

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [InternBlockTorch(hidden, heads, ffn)
                     for _ in range(layers)])

        class VM(nn.Module):
            def __init__(self):
                super().__init__()
                self.embeddings = Emb()
                self.encoder = Enc()

        self.vision_model = VM()
        pin = hidden * downsample * downsample
        self.mlp1 = nn.ModuleDict({
            "0": nn.LayerNorm(pin, eps=1e-5),
            "1": nn.Linear(pin, llm_hidden),
            "3": nn.Linear(llm_hidden, llm_hidden),
        })
        self.grid = g
        self.hidden = hidden
        self.downsample = downsample

    def forward(self, patches):
        tiles, pc, _ = patches.shape
        e = self.vision_model.embeddings
        x = e.patch_embedding(patches)
        cls = e.class_embedding.expand(tiles, 1, self.hidden)
        x = torch.cat([cls, x], dim=1) + e.position_embedding
        for blk in self.vision_model.encoder.layers:
            x = blk(x)
        g, ds = self.grid, self.downsample
        x = x[:, 1:].reshape(tiles, g, g, self.hidden)
        r = g // ds
        x = x.reshape(tiles, g, r, self.hidden * ds)
        x = x.transpose(1, 2)
        x = x.reshape(tiles, r, r, self.hidden * ds * ds)
        x = x.transpose(1, 2)
        x = x.reshape(tiles * r * r, self.hidden * ds * ds)
        x = self.mlp1["0"](x)
        x = F.gelu(self.mlp1["1"](x), approximate="none")
        return self.mlp1["3"](x)


class TorchRMS(nn.Module):
    def __init__(self, d, eps=1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(d))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps) *
                self.weight.float()).to(x.dtype)


class GlmVisionBlockTorch(nn.Module):
    def __init__(self, d, heads, ffn, eps=1e-5, attn_bias=False):
        super().__init__()
        hd = d // heads
        self.norm1 = TorchRMS(d, eps)
        self.norm2 = TorchRMS(d, eps)
        self.attn = nn.ModuleDict({
            "qkv": nn.Linear(d, 3 * d, bias=attn_bias),
            "proj": nn.Linear(d, d, bias=attn_bias),
            "q_norm": TorchRMS(hd, eps),
            "k_norm": TorchRMS(hd, eps),
        })
        self.mlp = nn.ModuleDict({
            "gate_proj": nn.Linear(d, ffn, bias=False),
            "up_proj": nn.Linear(d, ffn, bias=False),
            "down_proj": nn.Linear(ffn, d, bias=False),
        })
        self.heads = heads

    def forward(self, x, cos, sin):
        t, d = x.shape
        hd = d // self.heads
        h = self.norm1(x)
        qkv = self.attn["qkv"](h).reshape(t, 3, self.heads, hd)
        q = self.attn["q_norm"](qkv[:, 0]).transpose(0, 1)
        k = self.attn["k_norm"](qkv[:, 1]).transpose(0, 1)
        v = qkv[:, 2].transpose(0, 1)
        q = q * cos[None] + rotate_half(q) * sin[None]
        k = k * cos[None] + rotate_half(k) * sin[None]
        o = F.scaled_dot_product_attention(q[None], k[None], v[None])[0]
        o = o.transpose(0, 1).reshape(t, d)
        x = x + self.attn["proj"](o)
        h = self.norm2(x)
        h = self.mlp["down_proj"](F.silu(self.mlp["gate_proj"](h))
                                  * self.mlp["up_proj"](h))
        return x + h


class GlmVisionTorch(nn.Module):
    def __init__(self, hidden=32, heads=4, ffn=64, depth=2, patch=4,
                 merge=2, out_hidden=48, eps=1e-5):
        super().__init__()
        patch_dim = 3 * patch * patch

        class PE(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(patch_dim, hidden)

        self.patch_embed = PE()
        self.blocks = nn.ModuleList(
            [GlmVisionBlockTorch(hidden, heads, ffn, eps)
             for _ in range(depth)])
        self.post_layernorm = TorchRMS(hidden, eps)
        self.downsample = nn.Conv2d(hidden, out_hidden, merge, stride=merge)
        self.merger = nn.ModuleDict({
            "proj": nn.Linear(out_hidden, out_hidden, bias=False),
            "post_projection_norm": nn.LayerNorm(out_hidden, eps=eps),
            "gate_proj": nn.Linear(out_hidden, out_hidden * 3, bias=False),
            "up_proj": nn.Linear(out_hidden, out_hidden * 3, bias=False),
            "down_proj": nn.Linear(out_hidden * 3, out_hidden, bias=False),
        })
        self.merge = merge
        self.hidden = hidden

    def forward(self, patches, cos, sin):
        x = self.patch_embed.proj(patches)
        for b in self.blocks:
            x = b(x, cos, sin)
        x = self.post_layernorm(x)
        m = self.merge
        t = x.shape[0]
        x = x.reshape(t // (m * m), m, m, self.hidden).permute(0, 3, 1, 2)
        x = self.downsample(x).reshape(t // (m * m), -1)
        x = self.merger["proj"](x)
        x = self.merger["post_projection_norm"](x)
        x = F.gelu(x, approximate="tanh")
        g = F.silu(self.merger["gate_proj"](x)) * self.merger["up_proj"](x)
        return self.merger["down_proj"](g)


class OvisVisionBlockTorch(nn.Module):
    def __init__(self, d, heads, ffn, eps=1e-6):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=eps)
        self.norm2 = nn.LayerNorm(d, eps=eps)
        self.attn = nn.ModuleDict({"qkv": nn.Linear(d, 3 * d),
                                   "proj": nn.Linear(d, d)})
        self.mlp = nn.ModuleDict({"linear_fc1": nn.Linear(d, ffn),
                                  "linear_fc2": nn.Linear(ffn, d)})
        self.heads = heads

    def forward(self, x, cos, sin):
        t, d = x.shape
        hd = d // self.heads
        h = self.norm1(x)
        qkv = self.attn["qkv"](h).reshape(t, 3, self.heads, hd)
        q = qkv[:, 0].transpose(0, 1)
        k = qkv[:, 1].transpose(0, 1)
        v = qkv[:, 2].transpose(0, 1)
        q = q * cos[None] + rotate_half(q) * sin[None]
        k = k * cos[None] + rotate_half(k) * sin[None]
        o = F.scaled_dot_product_attention(q[None], k[None], v[None])[0]
        o = o.transpose(0, 1).reshape(t, d)
        x = x + self.attn["proj"](o)
        h = self.norm2(x)
        h = self.mlp["linear_fc2"](
            F.gelu(self.mlp["linear_fc1"](h), approximate="tanh"))
        return x + h


class OvisVisionTorch(nn.Module):
    def __init__(self, hidden=32, heads=4, ffn=64, depth=2, patch=4,
                 merge=2, out_hidden=48, num_positions=16, eps=1e-6):
        super().__init__()
        patch_dim = 3 * patch * patch

        class PE(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(patch_dim, hidden, bias=False)

        self.patch_embed = PE()
        self.pos_embed = nn.Embedding(num_positions, hidden)
        self.blocks = nn.ModuleList(
            [OvisVisionBlockTorch(hidden, heads, ffn, eps)
             for _ in range(depth)])
        self.merger = nn.ModuleDict({
            "norm": nn.LayerNorm(hidden, eps=eps),
            "linear_fc1": nn.Linear(merge * merge * hidden,
                                    merge * merge * hidden),
            "linear_fc2": nn.Linear(merge * merge * hidden, out_hidden),
        })
        self.merge = merge
        self.hidden = hidden

    def forward(self, patches, pos_embed, cos, sin):
        x = self.patch_embed.proj(patches) + pos_embed
        for b in self.blocks:
            x = b(x, cos, sin)
        x = self.merger["norm"](x)
        g = self.merge ** 2
        x = x.reshape(x.shape[0] // g, g * self.hidden)
        x = F.gelu(self.merger["linear_fc1"](x), approximate="none")
        return self.merger["linear_fc2"](x)


class MonkeyVisionBlockTorch(nn.Module):
    def __init__(self, d, heads, ffn, eps=1e-6):
        super().__init__()
        self.norm1 = TorchRMS(d, eps)
        self.norm2 = TorchRMS(d, eps)
        self.attn = nn.ModuleDict({
            "qkv": nn.Linear(d, 3 * d, bias=False),
            "proj": nn.Linear(d, d, bias=False),
        })
        self.mlp = nn.ModuleDict({
            "fc1": nn.Linear(d, ffn, bias=False),
            "fc3": nn.Linear(d, ffn, bias=False),
            "fc2": nn.Linear(ffn, d, bias=False),
        })
        self.heads = heads

    def forward(self, x, cos, sin):
        t, d = x.shape
        hd = d // self.heads
        h = self.norm1(x)
        qkv = self.attn["qkv"](h).reshape(t, 3, self.heads, hd)
        q = qkv[:, 0].transpose(0, 1)
        k = qkv[:, 1].transpose(0, 1)
        v = qkv[:, 2].transpose(0, 1)
        q = q * cos[None] + rotate_half(q) * sin[None]
        k = k * cos[None] + rotate_half(k) * sin[None]
        o = F.scaled_dot_product_attention(q[None], k[None], v[None])[0]
        o = o.transpose(0, 1).reshape(t, d)
        x = x + self.attn["proj"](o)
        h = self.norm2(x)
        h = self.mlp["fc2"](F.silu(self.mlp["fc1"](h)) * self.mlp["fc3"](h))
        return x + h


class MonkeyVisionTorch(nn.Module):
    def __init__(self, embed_dim=32, heads=4, ffn=64, depth=2, patch=4,
                 merge=2, out_hidden=48, eps=1e-6):
        super().__init__()
        patch_dim = 3 * patch * patch

        class Patchifier(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(patch_dim, embed_dim)
                self.norm = TorchRMS(embed_dim, eps)

        class PE(nn.Module):
            def __init__(self):
                super().__init__()
                self.patchifier = Patchifier()

        self.patch_embed = PE()
        self.blocks = nn.ModuleList(
            [MonkeyVisionBlockTorch(embed_dim, heads, ffn, eps)
             for _ in range(depth)])
        self.post_trunk_norm = TorchRMS(embed_dim, eps)
        self.merger = nn.ModuleDict({
            "ln_q": nn.LayerNorm(embed_dim, eps=1e-6),
            "mlp": nn.ModuleDict({
                "0": nn.Linear(merge * merge * embed_dim,
                               merge * merge * embed_dim),
                "2": nn.Linear(merge * merge * embed_dim, out_hidden),
            }),
        })
        self.merge = merge

    def forward(self, patches, cos, sin):
        x = self.patch_embed.patchifier.norm(
            self.patch_embed.patchifier.proj(patches))
        for b in self.blocks:
            x = b(x, cos, sin)
        x = self.post_trunk_norm(x)
        x = self.merger["ln_q"](x)
        g = self.merge ** 2
        x = x.reshape(x.shape[0] // g, -1)
        x = F.gelu(self.merger["mlp"]["0"](x), approximate="none")
        return self.merger["mlp"]["2"](x)

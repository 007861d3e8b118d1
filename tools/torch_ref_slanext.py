"""Independent torch oracle for SLANeXt (Vary-ViT-B + SLAHead).

The reference runs SLANeXt_wired / SLANeXt_wireless as opaque ONNX graphs
(oar-ocr-core/src/models/recognition/slanet.rs:38-235; input presets
core/config/model_input.rs:322-360 — wired 512x512, wireless 488x488,
BGR + ImageNet). This mirrors the architecture those graphs were exported
from: PaddleOCR's SLANeXt = Vary_VIT_B backbone (the SAM ViT-B image
encoder with decomposed relative-position windowed attention, 256-channel
conv neck, plus Vary's extra stride-2 conv) feeding the SLAHead
autoregressive structure decoder (hidden 512).

Dim pinning by byte arithmetic on the published export (both files are
367,743,373 bytes = 350.7 MiB, docs/models.md:176-177 ≈ 91.9M f32
params): SAM ViT-B trunk (85.11M blocks + 0.59M patch embed + 0.79M
32x32 pos embed + 0.79M neck) + net_2 256->512/s2 (1.18M) + SLAHead
(in=512, hidden=512, ~2.73M) = 91.19M.  The full Vary tower (net_3 ->
1024 + 1024x1024 projector) would be ~98M = 392MB and does not fit, so
the export stops at net_2 with out_channels=512.  Re-validate against
the real checkpoint tensor list at conversion time.

Naming follows the Paddle attribute paths (``backbone.vision_tower_high.
blocks.0.attn.qkv`` ...), exported through paddle_state_dict so the
ConversionMap in slanext_exact.build_slanext_map consumes official names.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tools.torch_ref import paddle_state_dict, seed_all  # noqa: F401
from tools.torch_ref_slanet import SLAHead


class LayerNorm2d(nn.Module):
    """SAM's channels-first LayerNorm (eps 1e-6)."""

    def __init__(self, c: int, eps: float = 1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class PatchEmbed(nn.Module):
    def __init__(self, patch: int, in_c: int, dim: int):
        super().__init__()
        self.proj = nn.Conv2d(in_c, dim, patch, stride=patch)

    def forward(self, x):
        return self.proj(x).permute(0, 2, 3, 1)     # B H W C


def get_rel_pos(q_size: int, k_size: int, rel_pos: torch.Tensor):
    """SAM decomposed rel-pos table lookup with linear re-interpolation
    when the stored table length differs from 2*size-1."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = F.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel_dist, mode="linear", align_corners=False,
        ).reshape(-1, max_rel_dist).permute(1, 0)
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.long()]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_hw, k_hw):
    qh, qw = q_hw
    kh, kw = k_hw
    Rh = get_rel_pos(qh, kh, rel_pos_h)
    Rw = get_rel_pos(qw, kw, rel_pos_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, qh, qw, dim)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = attn.view(B, qh * qw, kh * kw) + (
        rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    ).reshape(B, qh * qw, kh * kw)
    return attn


class Attention(nn.Module):
    def __init__(self, dim: int, heads: int, input_size: Tuple[int, int]):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        head_dim = dim // heads
        self.rel_pos_h = nn.Parameter(
            torch.zeros(2 * input_size[0] - 1, head_dim))
        self.rel_pos_w = nn.Parameter(
            torch.zeros(2 * input_size[1] - 1, head_dim))

    def forward(self, x):
        B, H, W, _ = x.shape
        qkv = self.qkv(x).reshape(B, H * W, 3, self.heads, -1).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, B * self.heads, H * W, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = add_decomposed_rel_pos(
            attn, q, self.rel_pos_h, self.rel_pos_w, (H, W), (H, W))
        attn = attn.softmax(dim=-1)
        x = (attn @ v).view(B, self.heads, H, W, -1).permute(
            0, 2, 3, 1, 4).reshape(B, H, W, -1)
        return self.proj(x)


def window_partition(x, ws: int):
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp))


def window_unpartition(windows, ws: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // ws // ws)
    x = windows.view(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class MLPBlock(nn.Module):
    def __init__(self, dim: int, mlp_dim: int):
        super().__init__()
        self.lin1 = nn.Linear(dim, mlp_dim)
        self.lin2 = nn.Linear(mlp_dim, dim)

    def forward(self, x):
        return self.lin2(F.gelu(self.lin1(x)))


class Block(nn.Module):
    def __init__(self, dim: int, heads: int, mlp_ratio: float,
                 window_size: int, input_size: Tuple[int, int]):
        super().__init__()
        self.window_size = window_size
        size = ((window_size, window_size) if window_size > 0
                else input_size)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads, size)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio))

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
            x = self.attn(x)
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        else:
            x = self.attn(x)
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class ImageEncoderViT(nn.Module):
    """SAM ViT image encoder + Vary's net_2 stride-2 conv tail."""

    def __init__(self, img_size=512, patch=16, dim=768, depth=12,
                 heads=12, mlp_ratio=4.0, out_chans=256, window=14,
                 global_idx=(2, 5, 8, 11), net2_out=512, net3_out=0):
        super().__init__()
        grid = img_size // patch
        self.patch_embed = PatchEmbed(patch, 3, dim)
        self.pos_embed = nn.Parameter(torch.zeros(1, grid, grid, dim))
        self.blocks = nn.ModuleList([
            Block(dim, heads, mlp_ratio,
                  0 if i in global_idx else window, (grid, grid))
            for i in range(depth)
        ])
        self.neck = nn.Sequential(
            nn.Conv2d(dim, out_chans, 1, bias=False),
            LayerNorm2d(out_chans),
            nn.Conv2d(out_chans, out_chans, 3, padding=1, bias=False),
            LayerNorm2d(out_chans),
        )
        self.net_2 = nn.Conv2d(out_chans, net2_out, 3, stride=2,
                               padding=1, bias=False)
        # Vary's second extra conv (full tower → 1024ch at stride 64);
        # absent (net3_out=0) in the SLANeXt export per byte arithmetic.
        if net3_out:
            self.net_3 = nn.Conv2d(net2_out, net3_out, 3, stride=2,
                                   padding=1, bias=False)
        else:
            self.net_3 = None

    def forward(self, x):
        x = self.patch_embed(x)
        pos = self.pos_embed
        if pos.shape[1:3] != x.shape[1:3]:
            pos = F.interpolate(
                pos.permute(0, 3, 1, 2), size=x.shape[1:3],
                mode="bilinear", align_corners=False).permute(0, 2, 3, 1)
        x = x + pos
        for blk in self.blocks:
            x = blk(x)
        x = self.neck(x.permute(0, 3, 1, 2))
        x = self.net_2(x)
        if self.net_3 is not None:
            x = self.net_3(x)
        return x


class VaryVITB(nn.Module):
    """Vary_VIT_B backbone module (attribute name vision_tower_high as in
    the Vary/PaddleOCR port).  With ``projector=True`` the stride-64
    feature map is flattened to a sequence and passed through
    ``mm_projector_vary`` (the PP-FormulaNet-L encoder shape)."""

    def __init__(self, projector: bool = False, **kw):
        super().__init__()
        self.vision_tower_high = ImageEncoderViT(**kw)
        if projector:
            c = kw.get("net3_out") or kw.get("net2_out", 512)
            self.mm_projector_vary = nn.Linear(c, c)
        else:
            self.mm_projector_vary = None

    def forward(self, x):
        x = self.vision_tower_high(x)
        if self.mm_projector_vary is None:
            return x
        b, c, h, w = x.shape
        return self.mm_projector_vary(
            x.flatten(2).permute(0, 2, 1))      # (B, N, C)


class SLANeXt(nn.Module):
    def __init__(self, vocab_size=50, img_size=512, patch=16, dim=768,
                 depth=12, heads=12, window=14, global_idx=(2, 5, 8, 11),
                 out_chans=256, net2_out=512, hidden_size=512,
                 max_text_length=500, loc_reg_num=8):
        super().__init__()
        self.backbone = VaryVITB(img_size=img_size, patch=patch, dim=dim,
                                 depth=depth, heads=heads, window=window,
                                 global_idx=global_idx, out_chans=out_chans,
                                 net2_out=net2_out)
        self.head = SLAHead(net2_out, hidden_size, vocab_size,
                            max_text_length, loc_reg_num)

    def forward(self, x):
        return self.head(self.backbone(x))


def export(model: nn.Module) -> Dict[str, np.ndarray]:
    return paddle_state_dict(model)

"""Torch golden-reference implementation of PP-OCRv5 mobile det + rec.

Role (VERDICT r1 #1): an executable, independent re-statement of the
deploy-exported PaddleOCR architectures — PPLCNetV3 backbone (repped),
RSEFPN + DBHead detector, EncoderWithSVTR + CTCHead recognizer — whose
``state_dict()`` keys, after the paddle renames below, are the official
deploy tensor names (PaddleOCR dygraph names after ``export_model.py``'s
``layer.rep()`` fusion). It serves two purposes:

1. **Fixture generator**: random-init → safetensors with official names →
   the exact input `tools/convert_weights.py` must accept.
2. **Golden oracle**: its forward defines the expected numerics; the
   converted flax model must match to float32 tolerance, layer for layer
   and end to end (tests/test_golden_parity.py).

Torch↔Paddle deltas handled at export: BN ``running_mean/_var`` →
``_mean/_variance``; ``nn.Linear`` weight (out,in) → paddle (in,out)
transpose; LAB scalars stored shape (1,). Everything else (Conv2d OIHW,
ConvTranspose2d (in,out,kH,kW), eps, padding) matches Paddle 1:1.

CPU-only torch; never imported by the package itself.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hardsigmoid_paddle(x):
    return torch.clamp(0.2 * x + 0.5, 0.0, 1.0)


class ConvBNLayer(nn.Module):
    def __init__(self, in_c, out_c, k, stride=1, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, k, stride, padding=k // 2,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(out_c, eps=1e-5)

    def forward(self, x):
        return self.bn(self.conv(x))


class LAB(nn.Module):
    def __init__(self):
        super().__init__()
        self.scale = nn.Parameter(torch.ones(1))
        self.bias = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        return self.scale * x + self.bias


class ActLAB(nn.Module):
    def __init__(self):
        super().__init__()
        self.lab = LAB()

    def forward(self, x):
        return self.lab(F.hardswish(x))


class LearnableRepLayer(nn.Module):
    """Deploy (is_repped) form only."""

    def __init__(self, in_c, out_c, k, stride=1, groups=1):
        super().__init__()
        self.stride = stride
        self.reparam_conv = nn.Conv2d(in_c, out_c, k, stride,
                                      padding=k // 2, groups=groups,
                                      bias=True)
        self.lab = LAB()
        if stride != 2:
            self.act = ActLAB()

    def forward(self, x):
        x = self.lab(self.reparam_conv(x))
        if self.stride != 2:
            x = self.act(x)
        return x


class SEModule(nn.Module):
    def __init__(self, c, reduction=4):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c // reduction, 1)
        self.conv2 = nn.Conv2d(c // reduction, c, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.relu(self.conv1(s))
        s = hardsigmoid_paddle(self.conv2(s))
        return x * s


class LCNetV3Block(nn.Module):
    def __init__(self, in_c, out_c, k, stride, use_se):
        super().__init__()
        self.dw_conv = LearnableRepLayer(in_c, in_c, k, stride, groups=in_c)
        if use_se:
            self.se = SEModule(in_c)
        self.use_se = use_se
        self.pw_conv = LearnableRepLayer(in_c, out_c, 1, 1)

    def forward(self, x):
        x = self.dw_conv(x)
        if self.use_se:
            x = self.se(x)
        return self.pw_conv(x)


NET_CONFIG_DET = {
    "blocks2": [(3, 16, 32, 1, False)],
    "blocks3": [(3, 32, 64, 2, False), (3, 64, 64, 1, False)],
    "blocks4": [(3, 64, 128, 2, False), (3, 128, 128, 1, False)],
    "blocks5": [(3, 128, 256, 2, False), (5, 256, 256, 1, False),
                (5, 256, 256, 1, False), (5, 256, 256, 1, False),
                (5, 256, 256, 1, False)],
    "blocks6": [(5, 256, 512, 2, True), (5, 512, 512, 1, True),
                (5, 512, 512, 1, False), (5, 512, 512, 1, False)],
}
NET_CONFIG_REC = {
    "blocks2": [(3, 16, 32, 1, False)],
    "blocks3": [(3, 32, 64, 1, False), (3, 64, 64, 1, False)],
    "blocks4": [(3, 64, 128, (2, 1), False), (3, 128, 128, 1, False)],
    "blocks5": [(3, 128, 256, (1, 2), False), (5, 256, 256, 1, False),
                (5, 256, 256, 1, False), (5, 256, 256, 1, False),
                (5, 256, 256, 1, False)],
    "blocks6": [(5, 256, 512, (2, 1), True), (5, 512, 512, 1, True),
                (5, 512, 512, (2, 1), False), (5, 512, 512, 1, False)],
}
DET_MV_C = (16, 24, 56, 480)


def _is_stride2(stride) -> bool:
    return stride == 2 or stride == (2, 2)


class PPLCNetV3(nn.Module):
    def __init__(self, scale=0.95, det=False):
        super().__init__()
        self.det = det
        cfg = NET_CONFIG_DET if det else NET_CONFIG_REC
        ch = lambda c: make_divisible(c * scale)
        self.conv1 = ConvBNLayer(3, ch(16), 3, 2)
        for stage, blocks in cfg.items():
            seq = nn.Sequential(*[
                LCNetV3Block(ch(in_c), ch(out_c), k,
                             stride, use_se)
                for (k, in_c, out_c, stride, use_se) in blocks])
            setattr(self, stage, seq)
        if det:
            self.layer_list = nn.ModuleList([
                nn.Conv2d(ch(cfg[f"blocks{i}"][-1][2]),
                          int(DET_MV_C[i - 3] * scale), 1)
                for i in range(3, 7)])
            self.out_channels = [int(c * scale) for c in DET_MV_C]
        else:
            self.out_channels = ch(512)

    def forward(self, x):
        x = self.conv1(x)
        x = self.blocks2(x)
        outs = []
        for stage in ("blocks3", "blocks4", "blocks5", "blocks6"):
            x = getattr(self, stage)(x)
            outs.append(x)
        if self.det:
            return [proj(f) for proj, f in zip(self.layer_list, outs)]
        return F.avg_pool2d(x, (3, 2))


# ------------------------------ det neck/head ------------------------------

class RSELayer(nn.Module):
    def __init__(self, in_c, out_c, k, shortcut=True):
        super().__init__()
        self.in_conv = nn.Conv2d(in_c, out_c, k, padding=k // 2, bias=False)
        self.se_block = SEModule(out_c)
        self.shortcut = shortcut

    def forward(self, x):
        ins = self.in_conv(x)
        out = self.se_block(ins)
        return ins + out if self.shortcut else out


class RSEFPN(nn.Module):
    def __init__(self, in_channels: Sequence[int], out_channels=96,
                 shortcut=True):
        super().__init__()
        self.ins_conv = nn.ModuleList([
            RSELayer(c, out_channels, 1, shortcut) for c in in_channels])
        self.inp_conv = nn.ModuleList([
            RSELayer(out_channels, out_channels // 4, 3, shortcut)
            for _ in in_channels])

    def forward(self, feats):
        c2, c3, c4, c5 = feats
        in5 = self.ins_conv[3](c5)
        in4 = self.ins_conv[2](c4)
        in3 = self.ins_conv[1](c3)
        in2 = self.ins_conv[0](c2)
        up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
        out4 = in4 + up(in5)
        out3 = in3 + up(out4)
        out2 = in2 + up(out3)
        p5 = self.inp_conv[3](in5)
        p4 = self.inp_conv[2](out4)
        p3 = self.inp_conv[1](out3)
        p2 = self.inp_conv[0](out2)
        p5 = F.interpolate(p5, scale_factor=8, mode="nearest")
        p4 = F.interpolate(p4, scale_factor=4, mode="nearest")
        p3 = F.interpolate(p3, scale_factor=2, mode="nearest")
        return torch.cat([p5, p4, p3, p2], dim=1)


class DBHeadBranch(nn.Module):
    """det_db_head.py Head (binarize branch at inference)."""

    def __init__(self, in_c):
        super().__init__()
        self.conv1 = nn.Conv2d(in_c, in_c // 4, 3, padding=1, bias=False)
        self.conv_bn1 = nn.BatchNorm2d(in_c // 4, eps=1e-5)
        self.conv2 = nn.ConvTranspose2d(in_c // 4, in_c // 4, 2, 2)
        self.conv_bn2 = nn.BatchNorm2d(in_c // 4, eps=1e-5)
        self.conv3 = nn.ConvTranspose2d(in_c // 4, 1, 2, 2)

    def forward(self, x):
        x = F.relu(self.conv_bn1(self.conv1(x)))
        x = F.relu(self.conv_bn2(self.conv2(x)))
        return torch.sigmoid(self.conv3(x))


class DBHead(nn.Module):
    def __init__(self, in_c):
        super().__init__()
        self.binarize = DBHeadBranch(in_c)

    def forward(self, x):
        return self.binarize(x)


class DBNetTorch(nn.Module):
    """PP-OCRv5_mobile_det: PPLCNetV3(0.75, det) + RSEFPN(96) + DBHead."""

    def __init__(self, scale=0.75, fpn_channels=96):
        super().__init__()
        self.backbone = PPLCNetV3(scale, det=True)
        self.neck = RSEFPN(self.backbone.out_channels, fpn_channels)
        self.head = DBHead(fpn_channels)

    def forward(self, x):
        return self.head(self.neck(self.backbone(x)))


# ------------------------------ rec neck/head ------------------------------

class ConvBNSwish(nn.Module):
    """rnn.py ConvBNLayer (conv no-bias + BN 'norm' + swish)."""

    def __init__(self, in_c, out_c, k=(1, 1)):
        super().__init__()
        if isinstance(k, int):
            k = (k, k)
        self.conv = nn.Conv2d(in_c, out_c, k,
                              padding=(k[0] // 2, k[1] // 2), bias=False)
        self.norm = nn.BatchNorm2d(out_c, eps=1e-5)

    def forward(self, x):
        return F.silu(self.norm(self.conv(x)))


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, t, c = x.shape
        qkv = self.qkv(x).reshape(b, t, 3, self.num_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, t, c)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.silu(self.fc1(x)))


class SVTRBlock(nn.Module):
    """svtrnet.py Block, prenorm=False branch."""

    def __init__(self, dim, num_heads=8, mlp_ratio=2.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.mixer = Attention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.mixer(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class EncoderWithSVTR(nn.Module):
    def __init__(self, in_c, dims=120, depth=2, hidden_dims=120,
                 kernel=(1, 3)):
        super().__init__()
        self.conv1 = ConvBNSwish(in_c, in_c // 8, kernel)
        self.conv2 = ConvBNSwish(in_c // 8, hidden_dims, 1)
        self.svtr_block = nn.ModuleList(
            [SVTRBlock(hidden_dims) for _ in range(depth)])
        self.norm = nn.LayerNorm(hidden_dims, eps=1e-6)
        self.conv3 = ConvBNSwish(hidden_dims, in_c, 1)
        self.conv4 = ConvBNSwish(2 * in_c, in_c // 8, kernel)
        self.conv1x1 = ConvBNSwish(in_c // 8, dims, 1)

    def forward(self, x):
        h = x
        z = self.conv2(self.conv1(x))
        b, c, hh, ww = z.shape
        z = z.flatten(2).transpose(1, 2)
        for blk in self.svtr_block:
            z = blk(z)
        z = self.norm(z)
        z = z.transpose(1, 2).reshape(b, c, hh, ww)
        z = self.conv3(z)
        z = torch.cat([h, z], dim=1)
        return self.conv1x1(self.conv4(z))


class CTCEncoder(nn.Module):
    """SequenceEncoder(type='svtr'): encoder then Im2Seq reshape."""

    def __init__(self, in_c, dims=120, depth=2, hidden_dims=120):
        super().__init__()
        self.encoder = EncoderWithSVTR(in_c, dims, depth, hidden_dims)

    def forward(self, x):
        x = self.encoder(x)
        return x.squeeze(2).transpose(1, 2)   # (B, W, C)


class CTCHead(nn.Module):
    def __init__(self, in_c, vocab):
        super().__init__()
        self.fc = nn.Linear(in_c, vocab)

    def forward(self, x):
        return F.softmax(self.fc(x), dim=-1)


class MultiHead(nn.Module):
    def __init__(self, in_c, vocab, dims=120, depth=2, hidden_dims=120):
        super().__init__()
        self.ctc_encoder = CTCEncoder(in_c, dims, depth, hidden_dims)
        self.ctc_head = CTCHead(dims, vocab)

    def forward(self, x):
        return self.ctc_head(self.ctc_encoder(x))


class SVTRRecTorch(nn.Module):
    """PP-OCRv5_mobile_rec: PPLCNetV3(0.95) + MultiHead CTC."""

    def __init__(self, vocab, scale=0.95):
        super().__init__()
        self.backbone = PPLCNetV3(scale, det=False)
        self.head = MultiHead(self.backbone.out_channels, vocab)

    def forward(self, x):
        return self.head(self.backbone(x))


# ------------------------------- export -------------------------------

def paddle_state_dict(model: nn.Module) -> Dict[str, np.ndarray]:
    """torch state_dict → paddle-named/layouted tensor dict (the official
    deploy names the ConversionMap consumes)."""

    linear_keys = {
        name + ".weight"
        for name, m in model.named_modules() if isinstance(m, nn.Linear)
    }
    out: Dict[str, np.ndarray] = {}
    for key, t in model.state_dict().items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = t.detach().cpu().numpy()
        name = key.replace("running_mean", "_mean").replace(
            "running_var", "_variance")
        if key in linear_keys:
            arr = arr.T          # torch (out,in) → paddle (in,out)
        out[name] = arr
    return out


def seed_all(model: nn.Module, seed: int = 0) -> None:
    """Deterministic nontrivial weights (BN stats included) so fixtures
    exercise every parameter."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.01)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.75)
    model.eval()

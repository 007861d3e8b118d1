"""Torch golden-reference RT-DETR (PPHGNetV2-L + HybridEncoder + decoder).

Same role as tools/torch_ref.py but for the RT-DETR family (VERDICT r1 #6):
an independent executable statement of the PaddleDetection deploy
architecture whose ``state_dict()`` keys, after the paddle renames in
``paddle_state_dict`` (torch_ref.py), are the official checkpoint tensor
names (``backbone.stem.stem1.conv.weight``,
``neck.encoder.0.layers.0.self_attn.in_proj_weight``,
``transformer.decoder.layers.5.cross_attn.sampling_offsets.weight``, …).

The deformable attention here uses torch's own F.grid_sample
(align_corners=False, zeros padding) — an independent implementation of
the bilinear sampling against which the JAX take_along_axis version in
models/detection/rtdetr.py is validated.

CPU-only torch; never imported by the package itself.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F

from tools.torch_ref import paddle_state_dict, seed_all  # noqa: F401


def seed_scaled(model: nn.Module, seed: int = 0) -> None:
    """Fan-in-scaled random weights. torch_ref.seed_all's flat 0.05 scale
    collapses activations through this much deeper net (entire feature
    levels round to identical f32 rows → massive top-k ties); scaling by
    1/√fan_in keeps rows distinct so query selection is untied."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim >= 2:
                fan_in = p.numel() // p.shape[0] if p.ndim > 2 else p.shape[0]
                p.copy_(torch.randn(p.shape, generator=g) / math.sqrt(fan_in))
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.05)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.75)
    model.eval()


class ConvBNAct(nn.Module):
    def __init__(self, in_c, out_c, k, stride=1, groups=1, use_act=True):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, k, stride, padding=(k - 1) // 2,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(out_c, eps=1e-5)
        self.use_act = use_act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.use_act else x


class LightConvBNAct(nn.Module):
    def __init__(self, in_c, out_c, k):
        super().__init__()
        self.conv1 = ConvBNAct(in_c, out_c, 1, use_act=False)
        self.conv2 = ConvBNAct(out_c, out_c, k, groups=out_c)

    def forward(self, x):
        return self.conv2(self.conv1(x))


class StemBlock(nn.Module):
    def __init__(self, in_c, mid_c, out_c):
        super().__init__()
        self.stem1 = ConvBNAct(in_c, mid_c, 3, 2)
        self.stem2a = ConvBNAct(mid_c, mid_c // 2, 2)
        self.stem2b = ConvBNAct(mid_c // 2, mid_c, 2)
        self.stem3 = ConvBNAct(mid_c * 2, mid_c, 3, 2)
        self.stem4 = ConvBNAct(mid_c, out_c, 1)

    def forward(self, x):
        x = self.stem1(x)
        x = F.pad(x, [0, 1, 0, 1])
        x2 = self.stem2a(x)
        x2 = F.pad(x2, [0, 1, 0, 1])
        x2 = self.stem2b(x2)
        x1 = F.max_pool2d(x, 2, stride=1)
        x = torch.cat([x1, x2], dim=1)
        return self.stem4(self.stem3(x))


class HGBlock(nn.Module):
    def __init__(self, in_c, mid_c, out_c, layer_num, kernel, light, ident):
        super().__init__()
        self.identity = ident
        self.layers = nn.ModuleList()
        for i in range(layer_num):
            ic = in_c if i == 0 else mid_c
            self.layers.append(LightConvBNAct(ic, mid_c, kernel) if light
                               else ConvBNAct(ic, mid_c, kernel))
        total = in_c + layer_num * mid_c
        self.aggregation_squeeze_conv = ConvBNAct(total, out_c // 2, 1)
        self.aggregation_excitation_conv = ConvBNAct(out_c // 2, out_c, 1)

    def forward(self, x):
        outs = [x]
        h = x
        for m in self.layers:
            h = m(h)
            outs.append(h)
        agg = self.aggregation_excitation_conv(
            self.aggregation_squeeze_conv(torch.cat(outs, dim=1)))
        return agg + x if self.identity else agg


ARCH = {
    "L": {"stem": (32, 48),
          "stages": ((48, 48, 128, 1, False, False, 3, 6),
                     (128, 96, 512, 1, True, False, 3, 6),
                     (512, 192, 1024, 3, True, True, 5, 6),
                     (1024, 384, 2048, 1, True, True, 5, 6))},
    "T": {"stem": (8, 12),
          "stages": ((12, 16, 32, 1, False, False, 3, 2),
                     (32, 24, 64, 1, True, False, 3, 2),
                     (64, 32, 128, 2, True, True, 5, 2),
                     (128, 48, 256, 1, True, True, 5, 2))},
}


class HGStage(nn.Module):
    def __init__(self, in_c, mid_c, out_c, blocks, down, light, k, ln):
        super().__init__()
        if down:
            self.downsample = ConvBNAct(in_c, in_c, 3, 2, groups=in_c,
                                        use_act=False)
        else:
            self.downsample = None
        mods = []
        for bi in range(blocks):
            mods.append(HGBlock(in_c if bi == 0 else out_c, mid_c, out_c,
                                ln, k, light, ident=bi > 0))
        self.blocks = nn.Sequential(*mods)

    def forward(self, x):
        if self.downsample is not None:
            x = self.downsample(x)
        return self.blocks(x)


class PPHGNetV2(nn.Module):
    def __init__(self, arch="L", return_idx=(1, 2, 3)):
        super().__init__()
        spec = ARCH[arch]
        self.return_idx = return_idx
        self.stem = StemBlock(3, *spec["stem"])
        self.stages = nn.ModuleList(
            [HGStage(*cfg) for cfg in spec["stages"]])

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for st in self.stages:
            x = st(x)
            outs.append(x)
        return [outs[i] for i in self.return_idx]


# ------------------------------ HybridEncoder ------------------------------

class BaseConv(nn.Module):
    def __init__(self, in_c, out_c, k, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, k, stride, padding=(k - 1) // 2,
                              bias=False)
        self.bn = nn.BatchNorm2d(out_c, eps=1e-5)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class RepConvBN(nn.Module):
    def __init__(self, in_c, out_c, k):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, k, padding=(k - 1) // 2,
                              bias=False)
        self.bn = nn.BatchNorm2d(out_c, eps=1e-5)

    def forward(self, x):
        return self.bn(self.conv(x))


class RepVggBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = RepConvBN(ch, ch, 3)
        self.conv2 = RepConvBN(ch, ch, 1)

    def forward(self, x):
        return F.silu(self.conv1(x) + self.conv2(x))


class CSPRepLayer(nn.Module):
    def __init__(self, in_c, out_c, num_blocks, expansion=1.0):
        super().__init__()
        hidden = int(out_c * expansion)
        self.conv1 = BaseConv(in_c, hidden, 1)
        self.conv2 = BaseConv(in_c, hidden, 1)
        self.bottlenecks = nn.Sequential(
            *[RepVggBlock(hidden) for _ in range(num_blocks)])
        self.conv3 = BaseConv(hidden, out_c, 1) if hidden != out_c else None

    def forward(self, x):
        h = self.bottlenecks(self.conv1(x)) + self.conv2(x)
        return self.conv3(h) if self.conv3 is not None else h


class FusedMHA(nn.Module):
    """ppdet MultiHeadAttention: fused in_proj stored in paddle layout
    (embed, 3·embed)."""

    def __init__(self, d, nhead):
        super().__init__()
        self.d = d
        self.nhead = nhead
        self.in_proj_weight = nn.Parameter(torch.empty(d, 3 * d))
        self.in_proj_bias = nn.Parameter(torch.zeros(3 * d))
        self.out_proj = nn.Linear(d, d)
        nn.init.xavier_uniform_(self.in_proj_weight)

    def forward(self, q_in, k_in, v_in):
        d, h = self.d, self.nhead
        hd = d // h
        q = q_in @ self.in_proj_weight[:, :d] + self.in_proj_bias[:d]
        k = k_in @ self.in_proj_weight[:, d:2 * d] + \
            self.in_proj_bias[d:2 * d]
        v = v_in @ self.in_proj_weight[:, 2 * d:] + self.in_proj_bias[2 * d:]
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        q = q.reshape(B, Lq, h, hd).transpose(1, 2) * (hd ** -0.5)
        k = k.reshape(B, Lk, h, hd).transpose(1, 2)
        v = v.reshape(B, Lk, h, hd).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2), dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, Lq, d)
        return self.out_proj(out)


class EncoderLayer(nn.Module):
    def __init__(self, d, nhead, ffn):
        super().__init__()
        self.self_attn = FusedMHA(d, nhead)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm1 = nn.LayerNorm(d, eps=1e-5)
        self.norm2 = nn.LayerNorm(d, eps=1e-5)

    def forward(self, src, pos):
        q = k = src + pos
        src = self.norm1(src + self.self_attn(q, k, src))
        h = self.linear2(F.gelu(self.linear1(src)))
        return self.norm2(src + h)


def sincos_pos_2d(w, h, dim, temperature=10000.0):
    grid_w, grid_h = torch.meshgrid(torch.arange(w, dtype=torch.float32),
                                    torch.arange(h, dtype=torch.float32),
                                    indexing="ij")
    pos_dim = dim // 4
    omega = torch.arange(pos_dim, dtype=torch.float32) / pos_dim
    omega = 1.0 / (temperature ** omega)
    out_w = grid_w.flatten()[:, None] * omega[None]
    out_h = grid_h.flatten()[:, None] * omega[None]
    return torch.cat([out_w.sin(), out_w.cos(), out_h.sin(), out_h.cos()],
                     dim=1)[None]


class Encoder(nn.Module):
    def __init__(self, layers):
        super().__init__()
        self.layers = nn.ModuleList(layers)

    def forward(self, x, pos):
        for m in self.layers:
            x = m(x, pos)
        return x


class HybridEncoder(nn.Module):
    def __init__(self, in_channels=(512, 1024, 2048), hidden=256, nhead=8,
                 ffn=1024, use_encoder_idx=(2,), num_layers=1,
                 expansion=1.0, depth_mult=1.0):
        super().__init__()
        self.hidden = hidden
        self.use_encoder_idx = use_encoder_idx
        self.input_proj = nn.ModuleList()
        for c in in_channels:
            self.input_proj.append(nn.Sequential(
                nn.Conv2d(c, hidden, 1, bias=False),
                nn.BatchNorm2d(hidden, eps=1e-5)))
        self.encoder = nn.ModuleList([
            Encoder([EncoderLayer(hidden, nhead, ffn)
                     for _ in range(num_layers)])
            for _ in use_encoder_idx])
        nlev = len(in_channels)
        nb = round(3 * depth_mult)
        self.lateral_convs = nn.ModuleList(
            [BaseConv(hidden, hidden, 1) for _ in range(nlev - 1)])
        self.fpn_blocks = nn.ModuleList(
            [CSPRepLayer(hidden * 2, hidden, nb, expansion)
             for _ in range(nlev - 1)])
        self.downsample_convs = nn.ModuleList(
            [BaseConv(hidden, hidden, 3, 2) for _ in range(nlev - 1)])
        self.pan_blocks = nn.ModuleList(
            [CSPRepLayer(hidden * 2, hidden, nb, expansion)
             for _ in range(nlev - 1)])

    def forward(self, feats):
        proj = [self.input_proj[i](f) for i, f in enumerate(feats)]
        for ei, enc_ind in enumerate(self.use_encoder_idx):
            f = proj[enc_ind]
            B, C, H, W = f.shape
            seq = f.flatten(2).permute(0, 2, 1)
            pos = sincos_pos_2d(W, H, self.hidden)
            seq = self.encoder[ei](seq, pos)
            proj[enc_ind] = seq.permute(0, 2, 1).reshape(B, C, H, W)
        nlev = len(proj)
        inner = [proj[-1]]
        for idx in range(nlev - 1, 0, -1):
            hi = self.lateral_convs[nlev - 1 - idx](inner[0])
            inner[0] = hi
            up = F.interpolate(hi, scale_factor=2.0, mode="nearest")
            inner.insert(0, self.fpn_blocks[nlev - 1 - idx](
                torch.cat([up, proj[idx - 1]], dim=1)))
        outs = [inner[0]]
        for idx in range(nlev - 1):
            down = self.downsample_convs[idx](outs[-1])
            outs.append(self.pan_blocks[idx](
                torch.cat([down, inner[idx + 1]], dim=1)))
        return outs


# --------------------------- RTDETRTransformer -----------------------------

class MLP(nn.Module):
    def __init__(self, in_dim, hidden, out_dim, num_layers):
        super().__init__()
        dims = [in_dim] + [hidden] * (num_layers - 1) + [out_dim]
        self.layers = nn.ModuleList(
            [nn.Linear(dims[i], dims[i + 1]) for i in range(num_layers)])

    def forward(self, x):
        for i, m in enumerate(self.layers):
            x = m(x)
            if i < len(self.layers) - 1:
                x = F.relu(x)
        return x


class MSDeformableAttention(nn.Module):
    def __init__(self, d=256, nhead=8, levels=3, points=4):
        super().__init__()
        self.d, self.nhead, self.levels, self.points = d, nhead, levels, points
        total = nhead * levels * points
        self.sampling_offsets = nn.Linear(d, total * 2)
        self.attention_weights = nn.Linear(d, total)
        self.value_proj = nn.Linear(d, d)
        self.output_proj = nn.Linear(d, d)

    def forward(self, query, ref_points, value, spatial_shapes):
        B, Q, _ = query.shape
        H, L, P = self.nhead, self.levels, self.points
        hd = self.d // H
        v = self.value_proj(value).reshape(B, -1, H, hd)
        off = self.sampling_offsets(query).reshape(B, Q, H, L, P, 2)
        aw = self.attention_weights(query).reshape(B, Q, H, L * P)
        aw = torch.softmax(aw, dim=-1).reshape(B, Q, H, L, P)
        loc = (ref_points[:, :, None, None, None, :2]
               + off / P * ref_points[:, :, None, None, None, 2:] * 0.5)
        start = 0
        sampled = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            vl = v[:, start:start + h * w]
            start += h * w
            vl = vl.permute(0, 2, 3, 1).reshape(B * H, hd, h, w)
            grid = loc[:, :, :, lvl] * 2.0 - 1.0           # (B,Q,H,P,2)
            grid = grid.permute(0, 2, 1, 3, 4).reshape(B * H, Q, P, 2)
            g = F.grid_sample(vl, grid, mode="bilinear",
                              padding_mode="zeros", align_corners=False)
            sampled.append(g.reshape(B, H, hd, Q, P))
        s = torch.stack(sampled, dim=4)                     # (B,H,hd,Q,L,P)
        w_ = aw.permute(0, 2, 1, 3, 4)[:, :, None]          # (B,H,1,Q,L,P)
        out = (s * w_).sum(dim=(4, 5))                      # (B,H,hd,Q)
        out = out.permute(0, 3, 1, 2).reshape(B, Q, self.d)
        return self.output_proj(out)


class DecoderLayer(nn.Module):
    def __init__(self, d=256, nhead=8, ffn=1024, levels=3, points=4):
        super().__init__()
        self.self_attn = FusedMHA(d, nhead)
        self.cross_attn = MSDeformableAttention(d, nhead, levels, points)
        self.norm1 = nn.LayerNorm(d, eps=1e-5)
        self.norm2 = nn.LayerNorm(d, eps=1e-5)
        self.norm3 = nn.LayerNorm(d, eps=1e-5)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)

    def forward(self, tgt, ref, memory, shapes, query_pos):
        q = k = tgt + query_pos
        tgt = self.norm1(tgt + self.self_attn(q, k, tgt))
        tgt = self.norm2(tgt + self.cross_attn(tgt + query_pos, ref,
                                               memory, shapes))
        h = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + h)


def inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(0.0, 1.0)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


class Decoder(nn.Module):
    def __init__(self, layers):
        super().__init__()
        self.layers = nn.ModuleList(layers)


class RTDETRTransformer(nn.Module):
    def __init__(self, num_classes, hidden=256, num_queries=300, nhead=8,
                 levels=3, points=4, num_layers=6, ffn=1024,
                 in_channels=(256, 256, 256)):
        super().__init__()
        self.num_classes = num_classes
        self.hidden = hidden
        self.num_queries = num_queries
        self.num_layers = num_layers
        self.input_proj = nn.ModuleList()
        for c in in_channels:
            m = nn.Sequential()
            m.add_module("conv", nn.Conv2d(c, hidden, 1, bias=False))
            m.add_module("norm", nn.BatchNorm2d(hidden, eps=1e-5))
            self.input_proj.append(m)
        self.decoder = Decoder([DecoderLayer(hidden, nhead, ffn, levels,
                                             points)
                                for _ in range(num_layers)])
        self.denoising_class_embed = nn.Embedding(num_classes + 1, hidden)
        self.query_pos_head = MLP(4, 2 * hidden, hidden, 2)
        self.enc_output = nn.Sequential(nn.Linear(hidden, hidden),
                                        nn.LayerNorm(hidden, eps=1e-5))
        self.enc_score_head = nn.Linear(hidden, num_classes)
        self.enc_bbox_head = MLP(hidden, hidden, 4, 3)
        self.dec_score_head = nn.ModuleList(
            [nn.Linear(hidden, num_classes) for _ in range(num_layers)])
        self.dec_bbox_head = nn.ModuleList(
            [MLP(hidden, hidden, 4, 3) for _ in range(num_layers)])

    def _anchors(self, shapes, grid_size=0.05, eps=1e-2):
        anchors = []
        for lvl, (h, w) in enumerate(shapes):
            gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                    torch.arange(w, dtype=torch.float32),
                                    indexing="ij")
            gxy = torch.stack([gx, gy], -1)
            gxy = (gxy + 0.5) / torch.tensor([w, h], dtype=torch.float32)
            wh = torch.ones_like(gxy) * grid_size * (2.0 ** lvl)
            anchors.append(torch.cat([gxy, wh], -1).reshape(1, h * w, 4))
        a = torch.cat(anchors, dim=1)
        valid = ((a > eps) & (a < 1 - eps)).all(-1, keepdim=True)
        a = torch.log(a / (1 - a))
        return torch.where(valid, a, torch.tensor(float("inf"))), valid

    def forward(self, feats):
        flat = []
        shapes = []
        for i, f in enumerate(feats):
            h = self.input_proj[i](f)
            shapes.append((h.shape[2], h.shape[3]))
            flat.append(h.flatten(2).permute(0, 2, 1))
        memory = torch.cat(flat, dim=1)

        anchors, valid = self._anchors(shapes)
        mem = torch.where(valid, memory, torch.zeros_like(memory))
        out_mem = self.enc_output(mem)
        enc_logits = self.enc_score_head(out_mem)
        enc_coord = self.enc_bbox_head(out_mem) + anchors

        topk = torch.topk(enc_logits.max(-1).values, self.num_queries,
                          dim=1).indices
        ref_unact = torch.gather(enc_coord, 1,
                                 topk[..., None].expand(-1, -1, 4))
        target = torch.gather(out_mem, 1,
                              topk[..., None].expand(-1, -1, self.hidden))

        ref_points = torch.sigmoid(ref_unact)
        output = target
        for li, layer in enumerate(self.decoder.layers):
            query_pos = self.query_pos_head(ref_points)
            output = layer(output, ref_points, memory, shapes, query_pos)
            inter_ref = torch.sigmoid(self.dec_bbox_head[li](output)
                                      + inverse_sigmoid(ref_points))
            if li == self.num_layers - 1:
                return self.dec_score_head[li](output), inter_ref
            ref_points = inter_ref


class RTDETRTorch(nn.Module):
    """Full RT-DETR: logits (B,Q,C) + boxes cxcywh (B,Q,4)."""

    def __init__(self, num_classes, arch="L", num_layers=6, hidden=256,
                 nhead=8, ffn=1024, num_queries=300):
        super().__init__()
        self.backbone = PPHGNetV2(arch)
        chans = tuple(cfg[2] for cfg in ARCH[arch]["stages"])[1:]
        self.neck = HybridEncoder(in_channels=chans, hidden=hidden,
                                  nhead=nhead, ffn=ffn)
        self.transformer = RTDETRTransformer(
            num_classes, hidden=hidden, num_queries=num_queries,
            nhead=nhead, num_layers=num_layers, ffn=ffn,
            in_channels=(hidden,) * 3)

    def forward(self, x):
        return self.transformer(self.neck(self.backbone(x)))

"""Torch golden reference for the unified per-family LLM decoders.

Flag-matched oracle for vl/llm_decoders.py (MinerU Qwen2-VL / SDAR Qwen3 /
GLM-OCR / OvisOCR2 hybrid). Implements the structural variants literally
and independently: interleaved partial rotary per glmocr/text.rs:29-87,
additive qk norms per ovisocr2/text.rs:456, GatedDeltaNet recurrence as a
plain per-step loop (dflash-style independent restatement of the rule),
depthwise causal conv via F.conv1d.

CPU-only torch; never imported by the package itself.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F

from tools.torch_ref_vl import hf_state_dict, seed_all  # noqa: F401


class TorchRMSNorm(nn.Module):
    def __init__(self, dim, eps):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype) \
            * self.weight


class TorchAdditiveRMSNorm(nn.Module):
    def __init__(self, dim, eps):
        super().__init__()
        self.weight = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        xhat = x.float() * torch.rsqrt(var + self.eps)
        return (xhat * (1.0 + self.weight.float())).to(x.dtype)


def apply_rotary(x, cos, sin, interleaved):
    rot = 2 * cos.shape[-1]
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    xf = x_rot.float()
    if interleaved:
        x1, x2 = xf[..., 0::2], xf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = torch.stack([o1, o2], -1).reshape(xf.shape)
    else:
        d2 = rot // 2
        x1, x2 = xf[..., :d2], xf[..., d2:]
        out = torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)
    return torch.cat([out.to(x.dtype), x_pass], -1)


class UnifiedAttentionTorch(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg
        hd = c["head_dim"]
        self.q_proj = nn.Linear(c["hidden"], c["heads"] * hd,
                                bias=c["qkv_bias"])
        self.k_proj = nn.Linear(c["hidden"], c["kv_heads"] * hd,
                                bias=c["qkv_bias"])
        self.v_proj = nn.Linear(c["hidden"], c["kv_heads"] * hd,
                                bias=c["qkv_bias"])
        self.o_proj = nn.Linear(c["heads"] * hd, c["hidden"], bias=False)
        if c["qk_norm"] == "rms":
            self.q_norm = TorchRMSNorm(hd, c["rms_eps"])
            self.k_norm = TorchRMSNorm(hd, c["rms_eps"])
        elif c["qk_norm"] == "additive":
            self.q_norm = TorchAdditiveRMSNorm(hd, c["rms_eps"])
            self.k_norm = TorchAdditiveRMSNorm(hd, c["rms_eps"])
        self.cfg = c

    def forward(self, x, cos, sin):
        c = self.cfg
        b, t, _ = x.shape
        hd = c["head_dim"]
        q = self.q_proj(x).reshape(b, t, c["heads"], hd)
        k = self.k_proj(x).reshape(b, t, c["kv_heads"], hd)
        v = self.v_proj(x).reshape(b, t, c["kv_heads"], hd)
        if c["qk_norm"]:
            q = self.q_norm(q)
            k = self.k_norm(k)
        q = q.transpose(1, 2)
        k = k.transpose(1, 2)
        v = v.transpose(1, 2)
        q = apply_rotary(q, cos[:, None], sin[:, None],
                         c["interleaved_rotary"])
        k = apply_rotary(k, cos[:, None], sin[:, None],
                         c["interleaved_rotary"])
        g = c["heads"] // c["kv_heads"]
        k = k.repeat_interleave(g, dim=1)
        v = v.repeat_interleave(g, dim=1)
        o = F.scaled_dot_product_attention(q, k, v, is_causal=True)
        o = o.transpose(1, 2).reshape(b, t, c["heads"] * hd)
        return self.o_proj(o)


class GatedDeltaNetTorch(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg
        d = c["linear_head_dim"]
        key_dim = c["linear_k_heads"] * d
        value_dim = c["linear_v_heads"] * d
        conv_dim = 2 * key_dim + value_dim
        self.in_proj_qkv = nn.Linear(c["hidden"], conv_dim, bias=False)
        self.in_proj_z = nn.Linear(c["hidden"], value_dim, bias=False)
        self.in_proj_b = nn.Linear(c["hidden"], c["linear_v_heads"],
                                   bias=False)
        self.in_proj_a = nn.Linear(c["hidden"], c["linear_v_heads"],
                                   bias=False)
        self.register_parameter("conv1d_weight", nn.Parameter(
            torch.randn(conv_dim, 1, c["conv_kernel"]) * 0.02))
        self.dt_bias = nn.Parameter(torch.zeros(c["linear_v_heads"]))
        self.A_log = nn.Parameter(torch.zeros(c["linear_v_heads"]))
        self.norm = TorchRMSNorm(d, c["rms_eps"])
        self.out_proj = nn.Linear(value_dim, c["hidden"], bias=False)
        self.cfg = c

    def forward(self, x):
        c = self.cfg
        b, t, _ = x.shape
        d = c["linear_head_dim"]
        hk, hv = c["linear_k_heads"], c["linear_v_heads"]
        key_dim, value_dim = hk * d, hv * d
        qkv = self.in_proj_qkv(x)
        z = self.in_proj_z(x)
        beta = torch.sigmoid(self.in_proj_b(x).float())
        alpha = torch.exp(-torch.exp(self.A_log.float())
                          * F.softplus(self.in_proj_a(x).float()
                                       + self.dt_bias))
        # depthwise causal conv + silu
        seq = qkv.float().transpose(1, 2)                   # (B, C, T)
        conv = F.conv1d(F.pad(seq, (c["conv_kernel"] - 1, 0)),
                        self.conv1d_weight.float(),
                        groups=seq.shape[1])
        conv = F.silu(conv).transpose(1, 2)                 # (B, T, C)
        qc = conv[..., :key_dim].reshape(b, t, hk, d)
        kc = conv[..., key_dim:2 * key_dim].reshape(b, t, hk, d)
        vc = conv[..., 2 * key_dim:].reshape(b, t, hv, d)
        rep = hv // hk
        qc = qc.repeat_interleave(rep, dim=2)
        kc = kc.repeat_interleave(rep, dim=2)
        # plain per-step delta rule: S ← α·S + β·(v − S·k̂)·k̂ᵀ, o = S·q̂
        S = torch.zeros(b, hv, d, d)
        outs = []
        for i in range(t):
            qi = F.normalize(qc[:, i].float(), dim=-1)      # (B, H, d)
            ki = F.normalize(kc[:, i].float(), dim=-1)
            vi = vc[:, i].float()
            S = alpha[:, i][..., None, None] * S
            pred = torch.einsum("bhkv,bhk->bhv", S, ki)
            delta = (vi - pred) * beta[:, i][..., None]
            S = S + torch.einsum("bhk,bhv->bhkv", ki, delta)
            outs.append(torch.einsum("bhkv,bhk->bhv", S, qi))
        o = torch.stack(outs, 1)                            # (B, T, H, d)
        o = self.norm(o.to(x.dtype))
        o = o * F.silu(z.reshape(b, t, hv, d))
        return self.out_proj(o.reshape(b, t, value_dim))


class UnifiedMlpTorch(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg
        self.fused = c["fused_gate_up"]
        if self.fused:
            self.gate_up_proj = nn.Linear(c["hidden"], 2 * c["ffn"],
                                          bias=False)
            self.down_proj = nn.Linear(c["ffn"], c["hidden"], bias=False)
        else:
            self.gate_proj = nn.Linear(c["hidden"], c["ffn"], bias=False)
            self.up_proj = nn.Linear(c["hidden"], c["ffn"], bias=False)
            self.down_proj = nn.Linear(c["ffn"], c["hidden"], bias=False)
        self.ffn = c["ffn"]

    def forward(self, x):
        if self.fused:
            gu = self.gate_up_proj(x)
            gate, up = gu[..., :self.ffn], gu[..., self.ffn:]
        else:
            gate, up = self.gate_proj(x), self.up_proj(x)
        return self.down_proj(F.silu(gate) * up)


class UnifiedLayerTorch(nn.Module):
    def __init__(self, cfg, idx):
        super().__init__()
        c = cfg
        self.input_layernorm = TorchRMSNorm(c["hidden"], c["rms_eps"])
        self.post_attention_layernorm = TorchRMSNorm(c["hidden"],
                                                     c["rms_eps"])
        kinds = c["layer_types"] or ("full_attention",)
        self.kind = kinds[idx % len(kinds)]
        if self.kind == "linear_attention":
            self.linear_attn = GatedDeltaNetTorch(c)
        else:
            self.self_attn = UnifiedAttentionTorch(c)
        self.mlp = UnifiedMlpTorch(c)
        if c["sandwich_norms"]:
            self.post_self_attn_layernorm = TorchRMSNorm(c["hidden"],
                                                         c["rms_eps"])
            self.post_mlp_layernorm = TorchRMSNorm(c["hidden"],
                                                   c["rms_eps"])
        self.sandwich = c["sandwich_norms"]

    def forward(self, x, cos, sin):
        h = self.input_layernorm(x)
        if self.kind == "linear_attention":
            attn = self.linear_attn(h)
        else:
            attn = self.self_attn(h, cos, sin)
        if self.sandwich:
            attn = self.post_self_attn_layernorm(attn)
        x = x + attn
        h = self.post_attention_layernorm(x)
        m = self.mlp(h)
        if self.sandwich:
            m = self.post_mlp_layernorm(m)
        return x + m


class UnifiedDecoderTorch(nn.Module):
    def __init__(self, **cfg):
        super().__init__()
        cfg.setdefault("qkv_bias", False)
        cfg.setdefault("qk_norm", None)
        cfg.setdefault("partial_rotary", 1.0)
        cfg.setdefault("interleaved_rotary", False)
        cfg.setdefault("fused_gate_up", False)
        cfg.setdefault("sandwich_norms", False)
        cfg.setdefault("rope_kind", "rope")
        cfg.setdefault("mrope_sections", ())
        cfg.setdefault("layer_types", ())
        cfg.setdefault("linear_v_heads", 4)
        cfg.setdefault("linear_k_heads", 2)
        cfg.setdefault("linear_head_dim", 16)
        cfg.setdefault("conv_kernel", 4)
        cfg.setdefault("rms_eps", 1e-6)
        cfg.setdefault("rope_theta", 10000.0)
        self.cfg = cfg
        self.embed_tokens = nn.Embedding(cfg["vocab_size"], cfg["hidden"])
        self.layers = nn.ModuleList(
            [UnifiedLayerTorch(cfg, i) for i in range(cfg["layers"])])
        self.norm = TorchRMSNorm(cfg["hidden"], cfg["rms_eps"])

    def rope_tables(self, position_ids):
        c = self.cfg
        rot = int(c["head_dim"] * c["partial_rotary"])
        inv = 1.0 / (c["rope_theta"] ** (
            torch.arange(0, rot, 2, dtype=torch.float32) / rot))
        if c["rope_kind"] == "mrope":
            freqs = position_ids[..., None].float() * inv   # (3, B, T, r/2)
            parts_c, parts_s, off = [], [], 0
            for axis, w in enumerate(c["mrope_sections"]):
                parts_c.append(freqs.cos()[axis][..., off:off + w])
                parts_s.append(freqs.sin()[axis][..., off:off + w])
                off += w
            return torch.cat(parts_c, -1), torch.cat(parts_s, -1)
        pos = position_ids if position_ids.ndim == 2 else position_ids[0]
        freqs = pos[..., None].float() * inv
        return freqs.cos(), freqs.sin()

    def forward(self, embeds, position_ids):
        cos, sin = self.rope_tables(position_ids)
        x = embeds
        for layer in self.layers:
            x = layer(x, cos, sin)
        return self.norm(x)

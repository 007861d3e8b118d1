"""Exact RT-DETR — PPHGNetV2 backbone + HybridEncoder + deformable decoder.

VERDICT r1 #6: the dense cross-attention stand-in in layout.py cannot
accept converted weights. This module is the deploy topology the reference
executes inside its RT-DETR ONNX graphs (oar-ocr-core/src/models/detection/
rtdetr.rs:77-241 wraps the PaddleDetection export; PP-DocLayout-L /
PP-DocLayout_plus-L / RT-DETR-L table-cell models are all RT-DETR-L):

- ``backbone``   PPHGNetV2 (hgnet_v2.py): StemBlock (stem1..stem4 + the
  asymmetric-pad 2×2 conv / maxpool concat trick), four HG_Stages of
  HG_Blocks (conv chain, concat, squeeze/excitation 1×1 aggregation),
  depthwise stride-2 downsample between stages; arch "L" returns
  strides 8/16/32 with channels 512/1024/2048.
- ``neck``       HybridEncoder (hybrid_encoder.py): per-level 1×1
  conv+BN input_proj, AIFI (one TransformerEncoderLayer with 2-D sincos
  position embedding on the stride-32 level, gelu FFN, fused-qkv
  MultiHeadAttention), CCFF top-down FPN + bottom-up PAN made of
  CSPRepLayers (silu BaseConvs, unfused RepVggBlock conv1+conv2).
- ``transformer`` RTDETRTransformer (rtdetr_transformer.py): per-level
  conv/norm input_proj, flattened multi-scale memory, anchor-grid query
  selection (enc_output → enc_score_head / enc_bbox_head → top-300 by
  max class logit), six TransformerDecoderLayers whose cross attention
  is multi-scale deformable attention (8 heads × 3 levels × 4 points,
  grid_sample align_corners=False semantics), per-layer score/bbox
  refinement heads, query_pos_head MLP on the running reference points.

Flax module names replicate the PaddleDetection attribute paths (dots
included) so ``runtime/ppocr_maps.py``'s renamer emits the official
deploy tensor names; the torch golden oracle is tools/torch_ref_rtdetr.py
(tests/test_rtdetr_parity.py asserts name + numeric parity).

TPU notes: everything is static-shaped; the deformable gather is a
take_along_axis bilinear over per-level flattened features (28.8k points
per image — negligible next to the backbone convs, which dominate and run
on the MXU). The level loops are Python loops over a static 3-tuple.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _pad(k: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    p = (k - 1) // 2
    return ((p, p), (p, p))


# --------------------------------------------------------------------------
# PPHGNetV2 backbone (ppdet/modeling/backbones/hgnet_v2.py, deploy form)
# --------------------------------------------------------------------------

class HGConvBNAct(nn.Module):
    """hgnet_v2 ConvBNAct: conv (no bias) + bn + relu (+ optional LAB)."""

    out_c: int
    kernel: int
    stride: int = 1
    groups: int = 1
    use_act: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_c, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=_pad(self.kernel),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=x.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="bn")(x)
        if self.use_act:
            x = jax.nn.relu(x)
        return x


class LightConvBNAct(nn.Module):
    """1×1 conv (no act) → depthwise k×k conv (relu)."""

    out_c: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        x = HGConvBNAct(self.out_c, 1, use_act=False, name="conv1")(x)
        return HGConvBNAct(self.out_c, self.kernel, groups=self.out_c,
                           name="conv2")(x)


class StemBlock(nn.Module):
    """hgnet_v2 StemBlock with the pad/maxpool/concat stem."""

    mid_c: int
    out_c: int

    @nn.compact
    def __call__(self, x):
        x = HGConvBNAct(self.mid_c, 3, stride=2, name="stem1")(x)
        # F.pad(x, [0, 1, 0, 1]): right/bottom by one (NHWC here)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = HGConvBNAct(self.mid_c // 2, 2, name="stem2a")(x)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = HGConvBNAct(self.mid_c, 2, name="stem2b")(x2)
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        x = jnp.concatenate([x1, x2], axis=-1)
        x = HGConvBNAct(self.mid_c, 3, stride=2, name="stem3")(x)
        return HGConvBNAct(self.out_c, 1, name="stem4")(x)


class HGBlockV2(nn.Module):
    """hgnet_v2 HG_Block: layer chain → concat → squeeze/excite 1×1s."""

    mid_c: int
    out_c: int
    layer_num: int
    kernel: int
    light_block: bool
    identity: bool

    @nn.compact
    def __call__(self, x):
        outs = [x]
        h = x
        for i in range(self.layer_num):
            if self.light_block:
                h = LightConvBNAct(self.mid_c, self.kernel,
                                   name=f"layers.{i}")(h)
            else:
                h = HGConvBNAct(self.mid_c, self.kernel,
                                name=f"layers.{i}")(h)
            outs.append(h)
        agg = jnp.concatenate(outs, axis=-1)
        agg = HGConvBNAct(self.out_c // 2, 1,
                          name="aggregation_squeeze_conv")(agg)
        agg = HGConvBNAct(self.out_c, 1,
                          name="aggregation_excitation_conv")(agg)
        if self.identity:
            agg = agg + x
        return agg


# arch spec: stem (mid, out); stages: (mid, out, blocks, downsample,
# light_block, kernel, layer_num) — hgnet_v2.py arch_configs
HGNETV2_ARCH = {
    "L": {
        "stem": (32, 48),
        "stages": (
            (48, 128, 1, False, False, 3, 6),
            (96, 512, 1, True, False, 3, 6),
            (192, 1024, 3, True, True, 5, 6),
            (384, 2048, 1, True, True, 5, 6),
        ),
    },
    "X": {
        "stem": (64, 64),
        "stages": (
            (64, 128, 1, False, False, 3, 6),
            (128, 512, 2, True, False, 3, 6),
            (256, 1024, 5, True, True, 5, 6),
            (512, 2048, 2, True, True, 5, 6),
        ),
    },
    # tiny config for CPU parity tests: every module type (plain + light
    # blocks, downsample, identity) at toy widths
    "T": {
        "stem": (8, 12),
        "stages": (
            (16, 32, 1, False, False, 3, 2),
            (24, 64, 1, True, False, 3, 2),
            (32, 128, 2, True, True, 5, 2),
            (48, 256, 1, True, True, 5, 2),
        ),
    },
}


class PPHGNetV2Det(nn.Module):
    """PPHGNetV2 trunk for RT-DETR (return_idx = [1, 2, 3])."""

    arch: str = "L"
    return_idx: Tuple[int, ...] = (1, 2, 3)

    @nn.compact
    def __call__(self, x):
        spec = HGNETV2_ARCH[self.arch]
        x = StemBlock(*spec["stem"], name="stem")(x)
        feats = []
        for si, (mid, out, blocks, down, light, k, ln) in enumerate(
                spec["stages"]):
            if down:
                x = HGConvBNAct(x.shape[-1], 3, stride=2,
                                groups=x.shape[-1], use_act=False,
                                name=f"stages.{si}.downsample")(x)
            for bi in range(blocks):
                x = HGBlockV2(mid, out, ln, k, light, identity=bi > 0,
                              name=f"stages.{si}.blocks.{bi}")(x)
            feats.append(x)
        return tuple(feats[i] for i in self.return_idx)

    def out_channels(self) -> Tuple[int, ...]:
        stages = HGNETV2_ARCH[self.arch]["stages"]
        return tuple(stages[i][1] for i in self.return_idx)


# --------------------------------------------------------------------------
# HybridEncoder (ppdet/modeling/transformers/hybrid_encoder.py)
# --------------------------------------------------------------------------

class BaseConv(nn.Module):
    """csp_darknet BaseConv: conv (no bias) + bn + silu."""

    out_c: int
    kernel: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_c, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=_pad(self.kernel), use_bias=False,
                    dtype=x.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="bn")(x)
        return jax.nn.silu(x)


class RepConvBN(nn.Module):
    """cspresnet ConvBNLayer (conv no-bias + bn, no act)."""

    out_c: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_c, (self.kernel, self.kernel),
                    padding=_pad(self.kernel), use_bias=False,
                    dtype=x.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                            dtype=x.dtype, name="bn")(x)


class RepVggBlock(nn.Module):
    """Training/unfused form (what the checkpoints store): silu(3×3 + 1×1)."""

    out_c: int

    @nn.compact
    def __call__(self, x):
        y = RepConvBN(self.out_c, 3, name="conv1")(x)
        z = RepConvBN(self.out_c, 1, name="conv2")(x)
        return jax.nn.silu(y + z)


class CSPRepLayer(nn.Module):
    out_c: int
    num_blocks: int
    expansion: float = 1.0

    @nn.compact
    def __call__(self, x):
        hidden = int(self.out_c * self.expansion)
        a = BaseConv(hidden, 1, name="conv1")(x)
        b = BaseConv(hidden, 1, name="conv2")(x)
        for i in range(self.num_blocks):
            a = RepVggBlock(hidden, name=f"bottlenecks.{i}")(a)
        h = a + b
        if hidden != self.out_c:
            h = BaseConv(self.out_c, 1, name="conv3")(h)
        return h


class FusedMHA(nn.Module):
    """ppdet layers.MultiHeadAttention with qkv_same_embed_dim: one fused
    ``in_proj_weight`` of paddle layout (embed, 3·embed) + ``out_proj``."""

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        d, h = self.embed_dim, self.num_heads
        hd = d // h
        w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                       (d, 3 * d))
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        w = w.astype(q_in.dtype)
        b = b.astype(q_in.dtype)
        q = q_in @ w[:, :d] + b[:d]
        k = k_in @ w[:, d:2 * d] + b[d:2 * d]
        v = v_in @ w[:, 2 * d:] + b[2 * d:]
        B, Lq = q.shape[0], q.shape[1]
        Lk = k.shape[1]
        q = q.reshape(B, Lq, h, hd) * (hd ** -0.5)
        k = k.reshape(B, Lk, h, hd)
        v = v.reshape(B, Lk, h, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1
                              ).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Lq, d)
        return nn.Dense(d, dtype=out.dtype, name="out_proj")(out)


class TransformerEncoderLayerAIFI(nn.Module):
    """detr_transformer TransformerEncoderLayer, post-norm, gelu FFN."""

    d_model: int
    nhead: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, src, pos_embed):
        q = k = src + pos_embed
        attn = FusedMHA(self.d_model, self.nhead, name="self_attn")(
            q, k, src)
        src = nn.LayerNorm(epsilon=1e-5, dtype=src.dtype,
                           name="norm1")(src + attn)
        h = nn.Dense(self.dim_feedforward, dtype=src.dtype,
                     name="linear1")(src)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.d_model, dtype=src.dtype, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=src.dtype,
                            name="norm2")(src + h)


def sincos_pos_embed_2d(w: int, h: int, embed_dim: int,
                        temperature: float = 10000.0) -> np.ndarray:
    """hybrid_encoder build_2d_sincos_position_embedding — replicated
    literally, including the meshgrid(w, h) flatten order quirk (the
    deployed level is square so the convention is baked into weights)."""
    grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32),
                                 np.arange(h, dtype=np.float32),
                                 indexing="ij")
    pos_dim = embed_dim // 4
    omega = np.arange(pos_dim, dtype=np.float32) / pos_dim
    omega = 1.0 / (temperature ** omega)
    out_w = grid_w.reshape(-1)[:, None] * omega[None]
    out_h = grid_h.reshape(-1)[:, None] * omega[None]
    return np.concatenate([np.sin(out_w), np.cos(out_w),
                           np.sin(out_h), np.cos(out_h)], axis=1)[None]


class HybridEncoder(nn.Module):
    """AIFI + CCFF over three levels; returns three (B,H,W,hidden) maps."""

    hidden_dim: int = 256
    use_encoder_idx: Tuple[int, ...] = (2,)
    num_encoder_layers: int = 1
    nhead: int = 8
    dim_feedforward: int = 1024
    expansion: float = 1.0
    depth_mult: float = 1.0

    @nn.compact
    def __call__(self, feats: Sequence[Any]):
        nlev = len(feats)
        proj = []
        for i, f in enumerate(feats):
            h = nn.Conv(self.hidden_dim, (1, 1), use_bias=False,
                        dtype=f.dtype, name=f"input_proj.{i}.0")(f)
            h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             dtype=f.dtype, name=f"input_proj.{i}.1")(h)
            proj.append(h)

        # AIFI on the selected level(s)
        for ei, enc_ind in enumerate(self.use_encoder_idx):
            f = proj[enc_ind]
            B, H, W, C = f.shape
            seq = f.reshape(B, H * W, C)
            pos = jnp.asarray(
                sincos_pos_embed_2d(W, H, self.hidden_dim), f.dtype)
            for li in range(self.num_encoder_layers):
                seq = TransformerEncoderLayerAIFI(
                    self.hidden_dim, self.nhead, self.dim_feedforward,
                    name=f"encoder.{ei}.layers.{li}")(seq, pos)
            proj[enc_ind] = seq.reshape(B, H, W, C)

        nb = round(3 * self.depth_mult)
        # top-down FPN
        inner = [proj[-1]]
        for idx in range(nlev - 1, 0, -1):
            hi = BaseConv(self.hidden_dim, 1,
                          name=f"lateral_convs.{nlev - 1 - idx}")(inner[0])
            inner[0] = hi
            up = jax.image.resize(
                hi, (hi.shape[0], hi.shape[1] * 2, hi.shape[2] * 2,
                     hi.shape[3]), method="nearest")
            merged = jnp.concatenate([up, proj[idx - 1]], axis=-1)
            out = CSPRepLayer(self.hidden_dim, nb, self.expansion,
                              name=f"fpn_blocks.{nlev - 1 - idx}")(merged)
            inner.insert(0, out)
        # bottom-up PAN
        outs = [inner[0]]
        for idx in range(nlev - 1):
            down = BaseConv(self.hidden_dim, 3, stride=2,
                            name=f"downsample_convs.{idx}")(outs[-1])
            merged = jnp.concatenate([down, inner[idx + 1]], axis=-1)
            outs.append(CSPRepLayer(self.hidden_dim, nb, self.expansion,
                                    name=f"pan_blocks.{idx}")(merged))
        return outs


# --------------------------------------------------------------------------
# RTDETRTransformer (ppdet/modeling/transformers/rtdetr_transformer.py)
# --------------------------------------------------------------------------

class MLPHead(nn.Module):
    """ppdet MLP: layers.{i} Linears with relu between."""

    hidden_dim: int
    out_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(self.out_dim if last else self.hidden_dim,
                         dtype=x.dtype, name=f"layers.{i}")(x)
            if not last:
                x = jax.nn.relu(x)
        return x


def _bilinear_gather(value: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
                     h: int, w: int) -> jnp.ndarray:
    """grid_sample(align_corners=False, padding_mode='zeros') over one
    flattened level.

    value: (B, heads, h·w, hd); gx/gy: (B, heads, S) pixel-center coords
    (already ``loc·size − 0.5``). Returns (B, heads, S, hd) float32.
    """
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (fx if dx else (1.0 - fx)) * (fy if dy else (1.0 - fy))
            inb = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            idx = yi_c * w + xi_c                       # (B, heads, S)
            g = jnp.take_along_axis(value, idx[..., None], axis=2)
            out = out + g * (wgt * inb.astype(jnp.float32))[..., None]
    return out


class MSDeformableAttention(nn.Module):
    """Multi-scale deformable attention, 4-dim reference points."""

    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4

    @nn.compact
    def __call__(self, query, ref_points, value,
                 spatial_shapes: Sequence[Tuple[int, int]]):
        B, Q, _ = query.shape
        H, L, P = self.num_heads, self.num_levels, self.num_points
        hd = self.embed_dim // H
        v = nn.Dense(self.embed_dim, dtype=value.dtype,
                     name="value_proj")(value)
        v = v.reshape(B, -1, H, hd)

        off = nn.Dense(H * L * P * 2, dtype=query.dtype,
                       name="sampling_offsets")(query)
        off = off.astype(jnp.float32).reshape(B, Q, H, L, P, 2)
        aw = nn.Dense(H * L * P, dtype=query.dtype,
                      name="attention_weights")(query)
        aw = jax.nn.softmax(
            aw.astype(jnp.float32).reshape(B, Q, H, L * P), axis=-1
        ).reshape(B, Q, H, L, P)

        # ref_points: (B, Q, 4) cxcywh in [0,1]
        ref = ref_points.astype(jnp.float32)
        loc = (ref[:, :, None, None, None, :2]
               + off / P * ref[:, :, None, None, None, 2:] * 0.5)

        # gather per level: value rows laid out level-major
        v32 = v.astype(jnp.float32).transpose(0, 2, 1, 3)  # (B,H,V,hd)
        start = 0
        level_out = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            vl = v32[:, :, start:start + h * w]
            start += h * w
            # (B, Q, H, P, 2) → (B, H, Q·P)
            l = loc[:, :, :, lvl]
            gx = l[..., 0].transpose(0, 2, 1, 3).reshape(B, H, Q * P) * w - 0.5
            gy = l[..., 1].transpose(0, 2, 1, 3).reshape(B, H, Q * P) * h - 0.5
            g = _bilinear_gather(vl, gx, gy, h, w)       # (B,H,Q·P,hd)
            level_out.append(g.reshape(B, H, Q, P, hd))
        sampled = jnp.stack(level_out, axis=3)           # (B,H,Q,L,P,hd)
        wts = aw.transpose(0, 2, 1, 3, 4)                # (B,H,Q,L,P)
        out = jnp.sum(sampled * wts[..., None], axis=(3, 4))  # (B,H,Q,hd)
        out = out.transpose(0, 2, 1, 3).reshape(B, Q, self.embed_dim)
        out = out.astype(query.dtype)
        return nn.Dense(self.embed_dim, dtype=query.dtype,
                        name="output_proj")(out)


class TransformerDecoderLayerRT(nn.Module):
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 1024
    num_levels: int = 3
    num_points: int = 4

    @nn.compact
    def __call__(self, tgt, ref_points, memory, spatial_shapes, query_pos):
        q = k = tgt + query_pos
        attn = FusedMHA(self.d_model, self.nhead, name="self_attn")(
            q, k, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=tgt.dtype,
                           name="norm1")(tgt + attn)
        cross = MSDeformableAttention(
            self.d_model, self.nhead, self.num_levels, self.num_points,
            name="cross_attn")(tgt + query_pos, ref_points, memory,
                               spatial_shapes)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=tgt.dtype,
                           name="norm2")(tgt + cross)
        h = nn.Dense(self.dim_feedforward, dtype=tgt.dtype,
                     name="linear1")(tgt)
        h = jax.nn.relu(h)
        h = nn.Dense(self.d_model, dtype=tgt.dtype, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=tgt.dtype,
                            name="norm3")(tgt + h)


def _inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1.0 - x, eps, None))


def generate_anchors(spatial_shapes: Sequence[Tuple[int, int]],
                     grid_size: float = 0.05, eps: float = 1e-2
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """rtdetr_transformer._generate_anchors (host, static shapes)."""
    anchors = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        gxy = np.stack([gx, gy], -1)
        gxy = (gxy + 0.5) / np.array([w, h], np.float32)
        wh = np.ones_like(gxy) * grid_size * (2.0 ** lvl)
        anchors.append(np.concatenate([gxy, wh], -1).reshape(1, h * w, 4))
    a = np.concatenate(anchors, axis=1)
    valid = ((a > eps) & (a < 1 - eps)).all(-1, keepdims=True)
    a = np.log(a / (1 - a))
    a = np.where(valid, a, np.inf)
    return a.astype(np.float32), valid


class RTDETRTransformer(nn.Module):
    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 300
    nhead: int = 8
    num_levels: int = 3
    num_points: int = 4
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024

    @nn.compact
    def __call__(self, feats: Sequence[Any]):
        dt = feats[0].dtype
        B = feats[0].shape[0]
        spatial_shapes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]

        # input_proj (named-sequential conv/norm)
        flat = []
        for i, f in enumerate(feats):
            h = nn.Conv(self.hidden_dim, (1, 1), use_bias=False, dtype=dt,
                        name=f"input_proj.{i}.conv")(f)
            h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             dtype=dt, name=f"input_proj.{i}.norm")(h)
            flat.append(h.reshape(B, -1, self.hidden_dim))
        memory = jnp.concatenate(flat, axis=1)           # (B, ΣHW, D)

        # training-only denoising embedding — created so real checkpoints
        # convert strictly; unused in eval forward.
        self.param("denoising_class_embed.weight",
                   nn.initializers.normal(1.0),
                   (self.num_classes + 1, self.hidden_dim))

        # ---- encoder-output query selection ----
        anchors_np, valid_np = generate_anchors(spatial_shapes)
        anchors = jnp.asarray(anchors_np)
        valid = jnp.asarray(valid_np)
        mem_f = jnp.where(valid, memory.astype(jnp.float32), 0.0).astype(dt)
        out_mem = nn.Dense(self.hidden_dim, dtype=dt,
                           name="enc_output.0")(mem_f)
        out_mem = nn.LayerNorm(epsilon=1e-5, dtype=dt,
                               name="enc_output.1")(out_mem)
        enc_logits = nn.Dense(self.num_classes, dtype=dt,
                              name="enc_score_head")(out_mem)
        enc_coord = MLPHead(self.hidden_dim, 4, 3,
                            name="enc_bbox_head")(out_mem)
        enc_coord = enc_coord.astype(jnp.float32) + anchors

        top_sc = jnp.max(enc_logits.astype(jnp.float32), axis=-1)
        _, topk_ind = jax.lax.top_k(top_sc, self.num_queries)   # (B, Q)
        ref_unact = jnp.take_along_axis(
            enc_coord, topk_ind[..., None], axis=1)             # (B,Q,4)
        target = jnp.take_along_axis(out_mem, topk_ind[..., None], axis=1)
        enc_topk_logits = jnp.take_along_axis(
            enc_logits, topk_ind[..., None], axis=1)

        # ---- decoder with iterative refinement ----
        ref_points = jax.nn.sigmoid(ref_unact)                  # f32
        output = target
        logits = boxes = None
        query_pos_head = MLPHead(2 * self.hidden_dim, self.hidden_dim, 2,
                                 name="query_pos_head")
        for li in range(self.num_decoder_layers):
            query_pos = query_pos_head(ref_points.astype(dt))
            output = TransformerDecoderLayerRT(
                self.hidden_dim, self.nhead, self.dim_feedforward,
                self.num_levels, self.num_points,
                name=f"decoder.layers.{li}")(
                output, ref_points, memory, spatial_shapes, query_pos)
            delta = MLPHead(self.hidden_dim, 4, 3,
                            name=f"dec_bbox_head.{li}")(output)
            inter_ref = jax.nn.sigmoid(
                delta.astype(jnp.float32) + _inverse_sigmoid(ref_points))
            if li == self.num_decoder_layers - 1:
                logits = nn.Dense(self.num_classes, dtype=dt,
                                  name=f"dec_score_head.{li}")(output)
                boxes = inter_ref
            else:
                # heads exist per layer in the checkpoint; create them so
                # strict conversion sees every tensor (outputs unused at
                # eval — XLA dead-code eliminates them).
                nn.Dense(self.num_classes, dtype=dt,
                         name=f"dec_score_head.{li}")(output)
            ref_points = inter_ref
        return logits.astype(jnp.float32), boxes, enc_topk_logits


class RTDETRExact(nn.Module):
    """backbone → neck → transformer; returns ((B,Q,C) logits f32,
    (B,Q,4) cxcywh∈[0,1] f32)."""

    num_classes: int
    arch: str = "L"
    hidden_dim: int = 256
    num_queries: int = 300
    num_decoder_layers: int = 6
    nhead: int = 8
    dim_feedforward: int = 1024

    @nn.compact
    def __call__(self, x):
        feats = PPHGNetV2Det(arch=self.arch, name="backbone")(x)
        enc = HybridEncoder(hidden_dim=self.hidden_dim, nhead=self.nhead,
                            dim_feedforward=self.dim_feedforward,
                            name="neck")(feats)
        logits, boxes, _ = RTDETRTransformer(
            num_classes=self.num_classes, hidden_dim=self.hidden_dim,
            num_queries=self.num_queries, nhead=self.nhead,
            dim_feedforward=self.dim_feedforward,
            num_decoder_layers=self.num_decoder_layers,
            name="transformer")(enc)
        return logits, boxes


def rtdetr_postprocess(logits: jnp.ndarray, boxes: jnp.ndarray,
                       num_top: int = 300):
    """DETRPostProcess (use_focal_loss): sigmoid → top-k over Q·C →
    (scores, labels, xyxy boxes normalized)."""
    B, Q, C = logits.shape
    scores = jax.nn.sigmoid(logits).reshape(B, Q * C)
    k = min(num_top, Q * C)
    top_sc, idx = jax.lax.top_k(scores, k)
    labels = idx % C
    qidx = idx // C
    sel = jnp.take_along_axis(boxes, qidx[..., None], axis=1)
    cx, cy, w, h = sel[..., 0], sel[..., 1], sel[..., 2], sel[..., 3]
    xyxy = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    return top_sc, labels, xyxy

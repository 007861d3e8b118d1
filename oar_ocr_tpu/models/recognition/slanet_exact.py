"""Exact SLANet: PPLCNet(v1) + CSPPAN + SLAHead at official tensor names.

The reference executes SLANet as an opaque ONNX graph (oar-ocr-core/src/
models/recognition/slanet.rs:38-235); this module reconstructs the
architecture that graph was exported from — PaddleOCR's
``configs/table/SLANet.yml``: PP-LCNet(scale 1.0) backbone → CSPPAN(96)
neck → SLAHead(hidden 256, max_text_length 500) — with flax module names
mirroring the Paddle attribute paths 1:1 (dots included), so the
``runtime/ppocr_maps.build_ppocr_map`` walker emits the official
checkpoint names directly (same convention as lcnetv3.py / db.py /
svtr.py):

- PP-LCNet (PaddleClas legendary pp_lcnet): ``conv1`` stem +
  ``blocks2..blocks6`` of DepthwiseSeparable {``dw_conv``, optional
  ``se`` (conv1/conv2, relu → hardsigmoid(0.2, 0.5)), ``pw_conv``},
  every ConvBNLayer = conv(no bias) + bn + hardswish; the table variant
  returns the blocks3/4/5/6 feature maps;
- CSPPAN (PicoDet csp_pan, act hard_swish, depthwise): ``conv_t.convs.i``
  1×1 projections, top-down ``top_down_blocks.i`` CSP layers over
  [nearest-upsample ‖ skip], bottom-up ``downsamples.i`` (DPModule
  dwconv/bn1/pwconv/bn2) + ``bottom_up_blocks.i``; CSPLayer =
  main_conv/short_conv/final_conv + ``blocks.0`` DarknetBottleneck
  (conv1 1×1, conv2 DPModule k5, identity add). The upsample targets the
  skip's exact H×W (488 is not divisible by 32, so feature sizes don't
  halve evenly — 16 up against 31);
- SLAHead (ppocr table_att_head): ``structure_attention_cell`` =
  AttentionGRUCell {i2h (no bias), h2h, score (no bias), rnn GRUCell
  with paddle-layout weight_ih/weight_hh (3H, in)/bias_ih/bias_hh},
  ``structure_generator.{0,1}`` and ``loc_generator.{0,1}`` (+sigmoid)
  Linear stacks; each step attends over the coarsest neck map, feeds
  one-hot of the previous token, and runs max_text_length+1 steps. Here
  the loop is the all-EOS early-exit ``nn.while_loop`` of
  models/recognition/slanet.py, writing static (B, T, ·) buffers.

Dual outputs (structure logits + loc preds) match slanet.rs:27-35; decode
semantics stay in slanet.decode_structure. SLANet_plus uses
loc_reg_num=8, SLANet(en) 4 — parameterized.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...runtime.runtime import Runtime, init_params
from ...utils.tracing import stage_timer
from ..lcnetv3 import SEModule, make_divisible
from .slanet import (EOS_ID, SOS_ID, TABLE_STRUCTURE_VOCAB, TableStructure,
                     decode_structure)


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


# (kernel, in_c, out_c, stride, use_se) — PaddleClas PP-LCNet NET_CONFIG.
PPLCNET_V1_CONFIG = {
    "blocks2": [(3, 16, 32, 1, False)],
    "blocks3": [(3, 32, 64, 2, False), (3, 64, 64, 1, False)],
    "blocks4": [(3, 64, 128, 2, False), (3, 128, 128, 1, False)],
    "blocks5": [(3, 128, 256, 2, False), (5, 256, 256, 1, False),
                (5, 256, 256, 1, False), (5, 256, 256, 1, False),
                (5, 256, 256, 1, False), (5, 256, 256, 1, False)],
    "blocks6": [(5, 256, 512, 2, True), (5, 512, 512, 1, True)],
}


class PPLCNetConvBN(nn.Module):
    """conv + bn (+hardswish) with the PP-LCNet attribute names."""

    features: int
    kernel: int
    strides: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((p, p), (p, p)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=x.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="bn")(x)
        return hardswish(x) if self.act else x


class DepthwiseSeparable(nn.Module):
    """dw_conv → (se) → pw_conv (PaddleClas pp_lcnet DepthwiseSeparable)."""

    in_c: int
    out_c: int
    kernel: int
    strides: int
    use_se: bool

    @nn.compact
    def __call__(self, x):
        x = PPLCNetConvBN(self.in_c, self.kernel, self.strides,
                          groups=self.in_c, name="dw_conv")(x)
        if self.use_se:
            x = SEModule(name="se")(x)
        return PPLCNetConvBN(self.out_c, 1, 1, name="pw_conv")(x)


class PPLCNetTable(nn.Module):
    """PP-LCNet v1 trunk returning the blocks3/4/5/6 maps (the table
    backbone variant consumed by CSPPAN; out channels ×scale)."""

    scale: float = 1.0

    @nn.compact
    def __call__(self, x) -> List[Any]:
        ch = lambda c: make_divisible(c * self.scale)
        x = PPLCNetConvBN(ch(16), 3, 2, name="conv1")(x)
        feats = []
        for stage in ("blocks2", "blocks3", "blocks4", "blocks5", "blocks6"):
            for i, (k, in_c, out_c, s, se) in enumerate(
                    PPLCNET_V1_CONFIG[stage]):
                x = DepthwiseSeparable(ch(in_c), ch(out_c), k, s, se,
                                       name=f"{stage}.{i}")(x)
            if stage != "blocks2":
                feats.append(x)
        return feats


# ----------------------------- CSPPAN neck -----------------------------


class CSPConvBN(nn.Module):
    """csp_pan ConvBNLayer: conv(no bias) + bn + act (hard_swish)."""

    features: int
    kernel: int = 1
    strides: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((p, p), (p, p)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=x.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="bn")(x)
        return hardswish(x)


class DPModule(nn.Module):
    """Depthwise-pointwise conv pair: dwconv/bn1 → pwconv/bn2, act after
    each bn (csp_pan DPModule)."""

    features: int
    kernel: int = 3
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((p, p), (p, p)),
                    feature_group_count=self.features, use_bias=False,
                    dtype=x.dtype, name="dwconv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="bn1")(x)
        x = hardswish(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=x.dtype,
                    name="pwconv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="bn2")(x)
        return hardswish(x)


class DarknetBottleneck(nn.Module):
    """conv1 (1×1) → conv2 (DPModule k) + identity (csp_pan)."""

    features: int
    kernel: int = 5

    @nn.compact
    def __call__(self, x):
        y = CSPConvBN(self.features, 1, name="conv1")(x)
        y = DPModule(self.features, self.kernel, name="conv2")(y)
        return x + y


class CSPLayer(nn.Module):
    """main/short 1×1 split, bottleneck chain, 1×1 fuse (csp_pan)."""

    features: int
    kernel: int = 5
    num_blocks: int = 1

    @nn.compact
    def __call__(self, x):
        mid = self.features // 2
        short = CSPConvBN(mid, 1, name="short_conv")(x)
        main = CSPConvBN(mid, 1, name="main_conv")(x)
        for i in range(self.num_blocks):
            main = DarknetBottleneck(mid, self.kernel,
                                     name=f"blocks.{i}")(main)
        return CSPConvBN(self.features, 1, name="final_conv")(
            jnp.concatenate([main, short], -1))


def _upsample_nearest(x, h: int, w: int):
    """Nearest-neighbour upsample to an exact (h, w) — 488-px inputs do
    not halve evenly through the pyramid, so scale_factor=2 is wrong."""
    b, sh, sw, c = x.shape
    rows = (jnp.arange(h) * sh) // h
    cols = (jnp.arange(w) * sw) // w
    return x[:, rows][:, :, cols]


class CSPPAN(nn.Module):
    """PicoDet CSP-PAN over the 4 backbone scales (csp_pan.py)."""

    features: int = 96
    kernel: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[Any]) -> List[Any]:
        n = len(feats)
        feats = [CSPConvBN(self.features, 1, name=f"conv_t.convs.{i}")(f)
                 for i, f in enumerate(feats)]
        # top-down
        inner = [feats[-1]]
        for idx in range(n - 1, 0, -1):
            low = feats[idx - 1]
            up = _upsample_nearest(inner[0], low.shape[1], low.shape[2])
            inner.insert(0, CSPLayer(
                self.features, self.kernel,
                name=f"top_down_blocks.{n - 1 - idx}")(
                    jnp.concatenate([up, low], -1)))
        # bottom-up
        outs = [inner[0]]
        for idx in range(n - 1):
            down = DPModule(self.features, self.kernel, strides=2,
                            name=f"downsamples.{idx}")(outs[-1])
            outs.append(CSPLayer(
                self.features, self.kernel,
                name=f"bottom_up_blocks.{idx}")(
                    jnp.concatenate([down, inner[idx + 1]], -1)))
        return outs


# ----------------------------- SLAHead -----------------------------


class AttentionGRUCell(nn.Module):
    """ppocr table_att_head AttentionGRUCell: additive attention over the
    visual memory + a GRU step on [context ‖ onehot(prev)].

    The GRU stores paddle-layout parameters (weight_ih/weight_hh of shape
    (3H, in)/(3H, H), bias_ih/bias_hh) under ``rnn``; gate order r, z, c;
    h' = (1−z)·c + z·h (paddle.nn.GRUCell semantics, same as torch)."""

    hidden: int
    num_embeddings: int

    @nn.compact
    def __call__(self, prev_hidden, batch_H, char_onehots):
        h_proj = nn.Dense(self.hidden, use_bias=False, dtype=batch_H.dtype,
                          name="i2h")(batch_H)
        p_proj = nn.Dense(self.hidden, dtype=batch_H.dtype,
                          name="h2h")(prev_hidden)[:, None, :]
        e = nn.Dense(1, use_bias=False, dtype=batch_H.dtype,
                     name="score")(jnp.tanh(h_proj + p_proj))
        alpha = jax.nn.softmax(e.astype(jnp.float32), axis=1).astype(
            batch_H.dtype)
        context = jnp.sum(alpha * batch_H, axis=1)
        x = jnp.concatenate([context, char_onehots], -1)

        in_dim = x.shape[-1]
        scale_ih = 1.0 / np.sqrt(in_dim)
        scale_hh = 1.0 / np.sqrt(self.hidden)
        w_ih = self.param("rnn.weight_ih",
                          nn.initializers.uniform(scale=scale_ih),
                          (3 * self.hidden, in_dim))
        w_hh = self.param("rnn.weight_hh",
                          nn.initializers.uniform(scale=scale_hh),
                          (3 * self.hidden, self.hidden))
        b_ih = self.param("rnn.bias_ih", nn.initializers.zeros,
                          (3 * self.hidden,))
        b_hh = self.param("rnn.bias_hh", nn.initializers.zeros,
                          (3 * self.hidden,))
        xg = x @ w_ih.T.astype(x.dtype) + b_ih.astype(x.dtype)
        hg = prev_hidden @ w_hh.T.astype(x.dtype) + b_hh.astype(x.dtype)
        x_r, x_z, x_c = jnp.split(xg, 3, -1)
        h_r, h_z, h_c = jnp.split(hg, 3, -1)
        r = jax.nn.sigmoid(x_r + h_r)
        z = jax.nn.sigmoid(x_z + h_z)
        c = jnp.tanh(x_c + r * h_c)
        return (1.0 - z) * c + z * prev_hidden


class SLAHeadExact(nn.Module):
    """ppocr SLAHead with the all-EOS early-exit while_loop."""

    out_channels: int
    hidden_size: int = 256
    max_text_length: int = 500
    loc_reg_num: int = 8

    @nn.compact
    def __call__(self, fea):
        b, h, w, c = fea.shape
        memory = fea.reshape(b, h * w, c).astype(jnp.float32)
        steps = self.max_text_length + 1
        cell = AttentionGRUCell(self.hidden_size, self.out_channels,
                                name="structure_attention_cell")
        gen0 = nn.Dense(self.hidden_size, name="structure_generator.0")
        gen1 = nn.Dense(self.out_channels, name="structure_generator.1")
        loc0 = nn.Dense(self.hidden_size, name="loc_generator.0")
        loc1 = nn.Dense(self.loc_reg_num, name="loc_generator.1")

        sbuf = jnp.zeros((b, steps, self.out_channels), jnp.float32)
        sbuf = sbuf.at[:, :, EOS_ID].set(1.0)   # finished rows decode EOS
        lbuf = jnp.zeros((b, steps, self.loc_reg_num), jnp.float32)

        def decode_step(mdl, hidden, chars):
            onehot = jax.nn.one_hot(chars, self.out_channels,
                                    dtype=memory.dtype)
            new_h = mdl(hidden, memory, onehot)
            structure = gen1(gen0(new_h))
            loc = jax.nn.sigmoid(loc1(loc0(new_h)))
            return new_h, structure, loc

        def cond_fn(_mdl, carry):
            _h, _tok, step, done, _s, _l = carry
            return (step < steps) & ~jnp.all(done)

        def body_fn(mdl, carry):
            hidden, tok, step, done, sb, lb = carry
            new_h, structure, loc = decode_step(mdl, hidden, tok)
            nxt = jnp.argmax(structure, -1).astype(jnp.int32)
            done_next = done | (nxt == EOS_ID)
            nxt = jnp.where(done, EOS_ID, nxt)
            sb = jax.lax.dynamic_update_slice(
                sb, structure[:, None, :], (0, step, 0))
            lb = jax.lax.dynamic_update_slice(
                lb, loc[:, None, :], (0, step, 0))
            return (new_h, nxt, step + 1, done_next, sb, lb)

        h0 = jnp.zeros((b, self.hidden_size), jnp.float32)
        tok0 = jnp.full((b,), SOS_ID, jnp.int32)
        carry = (h0, tok0, jnp.int32(0), jnp.zeros((b,), bool), sbuf, lbuf)
        carry = body_fn(cell, carry)   # step 0 unrolled: creates params
        _, _, _, _, logits, locs = nn.while_loop(
            cond_fn, body_fn, cell, carry, broadcast_variables="params")
        return logits, locs


class SLANetExact(nn.Module):
    """backbone → neck → head at the checkpoint roots; input (N, 488,
    488, 3) normalized BGR; returns ((N, T, vocab) logits, (N, T, loc))."""

    vocab_size: int = len(TABLE_STRUCTURE_VOCAB)
    scale: float = 1.0
    neck_channels: int = 96
    hidden_size: int = 256
    max_text_length: int = 500
    loc_reg_num: int = 8

    @nn.compact
    def __call__(self, x):
        feats = PPLCNetTable(self.scale, name="backbone")(x)
        outs = CSPPAN(self.neck_channels, name="neck")(feats)
        return SLAHeadExact(self.vocab_size, self.hidden_size,
                            self.max_text_length, self.loc_reg_num,
                            name="head")(outs[-1])


def build_slanet_map(params, *, name: str = "slanet"):
    """Official-name ConversionMap (same walker as det/rec)."""
    from ...runtime.ppocr_maps import build_ppocr_map

    return build_ppocr_map(params, name=name)


class SLANetExactModel:
    """Keep-ratio 488-pad driver around SLANetExact (the official
    TableResize + pad semantics; the generic SLANetModel warps the crop
    without preserving aspect)."""

    INPUT = 488

    def __init__(self, params=None, *, max_text_length: int = 500,
                 loc_reg_num: int = 8, runtime: Optional[Runtime] = None,
                 seed: int = 0):
        self.runtime = runtime or Runtime.default()
        self.model = SLANetExact(max_text_length=max_text_length,
                                 loc_reg_num=loc_reg_num)
        if params is None:
            params = init_params(
                self.model, (1, self.INPUT, self.INPUT, 3),
                dtype=jnp.float32, seed=seed)
        self.params = jax.device_put(params, self.runtime.device)
        self._fwd = jax.jit(self.model.apply)

    def recognize(self, pages_u8,
                  regions: Sequence[Tuple[int, Tuple[int, int, int, int]]],
                  angles: Optional[Sequence[int]] = None
                  ) -> List[TableStructure]:
        """Device path (drop-in for pipelines/table_analyzer.py): sample
        each table crop keep-ratio into the 488 canvas straight from the
        resident page batch; the padded area is exactly 0.0 post-normalize
        (ops/warp.sample_transform masks after normalization — the
        PaddingTableImage semantics)."""
        from ...ops.warp import NormSpec, resize_matrix, sample_transform

        if not regions:
            return []
        from .slanet import derot_dims, rotation_matrix

        n = self.INPUT
        angles = list(angles) if angles is not None else [0] * len(regions)
        mats, idxs, vw, vh, scales = [], [], [], [], []
        for (page_i, (x0, y0, x1, y1)), ang in zip(regions, angles):
            w, h = max(x1 - x0, 1), max(y1 - y0, 1)
            dw, dh = derot_dims(ang, w, h)
            s = min(n / dh, n / dw)
            nh, nw = max(int(round(dh * s)), 1), max(int(round(dw * s)), 1)
            m = (rotation_matrix(ang, w, h)
                 @ resize_matrix(dh, dw, nh, nw).astype(np.float64))
            shift = np.array([[1, 0, x0], [0, 1, y0], [0, 0, 1]],
                             np.float64)
            mats.append((shift @ m).astype(np.float32))
            idxs.append(page_i)
            vw.append(nw)
            vh.append(nh)
            scales.append((s, w, h, ang))
        base = NormSpec.imagenet_rgb()
        norm = NormSpec(base.alpha, base.beta, swap_rb=True)  # BGR
        if not hasattr(self, "_warp_fwd"):
            def run(params, pages, mats, idx, vw, vh):
                x = sample_transform(pages, mats, idx, vw, vh,
                                     out_h=n, out_w=n, norm=norm,
                                     out_dtype=jnp.float32)
                return self.model.apply(params, x)
            self._warp_fwd = jax.jit(run)
        with stage_timer("slanet_exact.device", batch=len(regions)):
            logits, locs = self._warp_fwd(
                self.params, pages_u8, jnp.asarray(np.stack(mats)),
                jnp.asarray(np.asarray(idxs, np.int32)),
                jnp.asarray(np.asarray(vw, np.int32)),
                jnp.asarray(np.asarray(vh, np.int32)))
            probs = jax.nn.softmax(jnp.asarray(logits), -1)
            ids = np.asarray(jnp.argmax(logits, -1).astype(jnp.int32))
            conf = np.asarray(jnp.max(probs, -1))
            locs = np.asarray(locs)
        return self._decode_batch(ids, conf, locs, scales)

    def _decode_batch(self, ids, conf, locs, scales) -> List[TableStructure]:
        from .slanet import rotate_boxes_back

        out = []
        for i, entry in enumerate(scales):
            s, w, h = entry[:3]
            ang = entry[3] if len(entry) > 3 else 0
            tokens, boxes, sc = decode_structure(ids[i], conf[i], locs[i])
            boxes = boxes * (self.INPUT / s)
            if boxes.size:
                boxes = rotate_boxes_back(boxes, ang, w, h)
                boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
                boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
            out.append(TableStructure(tokens=tokens, cell_boxes=boxes,
                                      score=float(np.mean(sc)) if sc
                                      else 0.0))
        return out

    def recognize_images(self, crops: Sequence[np.ndarray]
                         ) -> List[TableStructure]:
        """Host uint8 RGB table crops → structures (keep-ratio + pad)."""
        from ...core.constants import IMAGENET_MEAN, IMAGENET_STD

        if not crops:
            return []
        n = self.INPUT
        batch = np.zeros((len(crops), n, n, 3), np.float32)
        scales = []
        for i, im in enumerate(crops):
            h, w = im.shape[:2]
            s = min(n / h, n / w)
            nh, nw = max(int(round(h * s)), 1), max(int(round(w * s)), 1)
            ys = (np.arange(nh) * h // nh).astype(int)
            xs = (np.arange(nw) * w // nw).astype(int)
            resized = im[ys][:, xs].astype(np.float32)
            bgr = resized[..., ::-1] / 255.0           # slanet.rs:7-11
            bgr = (bgr - np.asarray(IMAGENET_MEAN)) / np.asarray(
                IMAGENET_STD)
            batch[i, :nh, :nw] = bgr
            scales.append((s, w, h))
        with stage_timer("slanet_exact.device", batch=len(crops)):
            logits, locs = self._fwd(self.params, jnp.asarray(batch))
            probs = jax.nn.softmax(jnp.asarray(logits), -1)
            ids = np.asarray(jnp.argmax(logits, -1).astype(jnp.int32))
            conf = np.asarray(jnp.max(probs, -1))
            locs = np.asarray(locs)
        return self._decode_batch(ids, conf, locs, scales)

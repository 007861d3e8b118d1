"""Blockwise (flash) attention — Pallas TPU kernel with XLA fallback.

TPU-native replacement for the reference's flash-attn dispatch
(oar-ocr-vl/src/attention.rs — candle flash-attn behind env kill
switches) used by every VLM family for vision encoding and prefill. The
kernel computes softmax(QKᵀ+mask)V with the online-softmax recurrence so
the (Tq, Tk) score matrix never materializes in HBM — the memory shape
that forced the reference's chunked-attention fallback
(paddleocr_vl/vision.rs:7-17) disappears.

Design: grid over (batch·heads, Tq blocks); K/V live in VMEM for the
whole row (sequences here are ≤ ~8k tokens ⇒ ≤ ~4 MB/head at D=128);
the kernel loops over K blocks with running (m, l, acc) statistics.
Supports causal masking and per-sequence valid lengths (padded vision
batches). Kill switch: OAR_TPU_DISABLE_PALLAS / RuntimeConfig
(falls back to the fused-XLA SDPA in vl/attention.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(vlen_ref, q_ref, k_ref, v_ref, o_ref,
                  *, block_k: int, causal: bool, scale: float):
    # q_ref: (1, block_q, D); k_ref/v_ref: (1, Tk, D); o_ref like q_ref
    # vlen_ref: (B·H,) int32 in SMEM — valid K length per row
    _, block_q, d = q_ref.shape
    tk = k_ref.shape[1]
    qi = pl.program_id(1)
    q_start = qi * block_q

    q = q_ref[0].astype(jnp.float32) * scale
    vlen = vlen_ref[pl.program_id(0)]

    nk = pl.cdiv(tk, block_k)

    def body(kj, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (bq, bk)

        kpos = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = kpos < vlen
        if causal:
            qpos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = mask & (kpos <= qpos)
        s = jnp.where(mask, s, _NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)        # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        # explicit re-mask: when a row's scores are ALL masked, m_new is
        # still _NEG_INF and exp(s - m_new) = exp(0) = 1 for every
        # masked key — l would sum to Tk and the row would output
        # mean(V) instead of reaching the l==0 → zeros guard below
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    if causal:
        # blocks strictly above the diagonal contribute nothing
        nk_eff = jnp.minimum(
            nk, pl.cdiv(q_start + block_q, block_k))
    else:
        nk_eff = nk
    m, l, acc = jax.lax.fori_loop(0, nk_eff, body, (m0, l0, acc0))
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "use_pallas",
                     "interpret"))
def flash_attention(
    q: jax.Array,                      # (B, H, Tq, D)
    k: jax.Array,                      # (B, H, Tk, D)  (H == Hkv after GQA repeat)
    v: jax.Array,                      # (B, H, Tk, D)
    *,
    valid_len: Optional[jax.Array] = None,   # (B,) int32 valid K length
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    use_pallas: bool = True,
    interpret: bool = False,
) -> jax.Array:
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / math.sqrt(d)

    platform = jax.devices()[0].platform
    if (not use_pallas
            or (platform not in ("tpu", "axon") and not interpret)
            or tq < block_q):
        # fused-XLA fallback (vl/attention semantics)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        mask = None
        if valid_len is not None:
            mask = (jnp.arange(tk)[None, :] <
                    valid_len[:, None])[:, None, None, :]
        if causal:
            cm = jnp.tril(jnp.ones((tq, tk), bool))[None, None]
            mask = cm if mask is None else (mask & cm)
        if mask is not None:
            logits = jnp.where(mask, logits, _NEG_INF)
        w = jax.nn.softmax(logits.astype(jnp.float32), -1)
        if mask is not None:
            # fully-masked rows (valid_len 0): softmax over -1e30 is
            # uniform garbage — zero them, matching the kernel's
            # masked-p + l==0 guard so both paths agree
            w = jnp.where(jnp.any(mask, axis=-1, keepdims=True), w, 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)

    # pad Tq/Tk/D to tile multiples
    tq_p = ((tq + block_q - 1) // block_q) * block_q
    tk_p = ((tk + block_k - 1) // block_k) * block_k
    d_p = max(((d + 127) // 128) * 128, 128)
    pad = lambda x, t, dd: jnp.pad(
        x, ((0, 0), (0, 0), (0, t - x.shape[2]), (0, dd - x.shape[3])))
    qp = pad(q, tq_p, d_p).reshape(b * h, tq_p, d_p)
    kp = pad(k, tk_p, d_p).reshape(b * h, tk_p, d_p)
    vp = pad(v, tk_p, d_p).reshape(b * h, tk_p, d_p)

    if valid_len is None:
        vlen = jnp.full((b,), tk, jnp.int32)
    else:
        vlen = valid_len.astype(jnp.int32)
    vlen_bh = jnp.repeat(vlen, h)                      # (B*H,)

    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               causal=causal, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, tq_p // block_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d_p), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_p, d_p), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_p, d_p), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_p),
                               lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d_p), q.dtype),
        interpret=interpret,
    )(vlen_bh, qp, kp, vp)

    return out.reshape(b, h, tq_p, d_p)[:, :, :tq, :d]

"""Exact per-family LLM decoders (the remaining VLM text backbones).

VERDICT r1 #3 remainder: the reference hand-writes one decoder per family;
structurally they span a small flag space over the LLaMA design, so here
ONE flag-driven module emits each family's EXACT checkpoint tree:

- MinerU 2.5 — Qwen2-VL text (mineru/text.rs:89-560): q/k/v WITH bias,
  o_proj bias-free, 3-axis MRoPE (select_rope_sections), RMSNorm pair,
  SwiGLU; names ``model.layers.{i}.self_attn.q_proj`` …
- SDAR / Qwen3 — shared by MinerU-Diffusion, MonkeyOCRv2 AND HPD-Parsing
  (mineru_diffusion/text.rs:273-575; monkeyocrv2/model.rs:63 and
  hpd_parsing/model.rs:344 both instantiate SdarModel): bias-free
  projections + per-head-dim q_norm/k_norm RMSNorms, standard RoPE;
  loaded under ``language_model.model.…`` + ``language_model.lm_head``.
- GLM-OCR (glmocr/text.rs:334-920): bias-free q/k/v/o, PARTIAL rotary
  (factor·head_dim dims, INTERLEAVED rotate-half :29-87), fused
  ``mlp.gate_up_proj``, and GLM4's sandwich norms (input / post_attention
  / post_self_attn / post_mlp per layer).
- OvisOCR2 (ovisocr2/text.rs): hybrid layer_types — "full_attention"
  layers with ADDITIVE qk RMSNorms ((1+w)·x̂, :456-510) and
  "linear_attention" GatedDeltaNet layers with the published tree
  (in_proj_qkv/z/b/a, depthwise conv1d, dt_bias, A_log, norm, out_proj,
  :160-230) running the gated delta rule (vl/gated_delta.py).

Every submodule name mirrors the HF safetensors tree so
runtime/ppocr_maps-style renaming converts published checkpoints;
tools/torch_ref_llm.py is the flag-matched oracle
(tests/test_llm_decoders_parity.py).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import mrope_cos_sin, scaled_dot_product_attention
from .kv_cache import KVCache
from .paddleocr_vl import RMSNorm, SwiGLU


@dataclass(frozen=True)
class UnifiedLMConfig:
    vocab_size: int = 512
    hidden: int = 64
    layers: int = 2
    heads: int = 4
    kv_heads: int = 2
    head_dim: int = 16
    ffn: int = 128
    rms_eps: float = 1e-6
    rope_theta: float = 10000.0
    # structural flags (see module docstring)
    qkv_bias: bool = False
    qk_norm: Optional[str] = None            # None | "rms" | "additive"
    partial_rotary: float = 1.0
    interleaved_rotary: bool = False
    fused_gate_up: bool = False
    sandwich_norms: bool = False
    rope_kind: str = "rope"                  # rope | mrope
    mrope_sections: Tuple[int, ...] = ()
    # "full_attention" / "linear_attention" per layer (Ovis hybrid);
    # empty = all full
    layer_types: Tuple[str, ...] = ()
    # GatedDeltaNet dims (Ovis linear layers)
    linear_v_heads: int = 4
    linear_k_heads: int = 2
    linear_head_dim: int = 16
    conv_kernel: int = 4
    eos_id: int = 2

    def kind(self, i: int) -> str:
        if not self.layer_types:
            return "full_attention"
        return self.layer_types[i % len(self.layer_types)]

    def delta_layers(self) -> Tuple[int, ...]:
        """Indices of the linear-attention (gated-delta) layers."""
        return tuple(i for i in range(self.layers)
                     if self.kind(i) == "linear_attention")


# Published-config presets (dims are config.json data; flags are the
# architecture facts the reference encodes)
MINERU_TEXT = UnifiedLMConfig(
    vocab_size=151936, hidden=1536, layers=28, heads=12, kv_heads=2,
    head_dim=128, ffn=8960, rms_eps=1e-6, rope_theta=1000000.0,
    qkv_bias=True, rope_kind="mrope", mrope_sections=(16, 24, 24))
SDAR_TEXT = UnifiedLMConfig(
    vocab_size=151936, hidden=1024, layers=28, heads=16, kv_heads=8,
    head_dim=128, ffn=3072, rms_eps=1e-6, rope_theta=1000000.0,
    qk_norm="rms")
GLM_TEXT = UnifiedLMConfig(
    vocab_size=151552, hidden=1536, layers=40, heads=12, kv_heads=2,
    head_dim=128, ffn=4608, rms_eps=1e-5, rope_theta=10000.0,
    partial_rotary=0.5, interleaved_rotary=True, fused_gate_up=True,
    sandwich_norms=True)
OVIS_TEXT = UnifiedLMConfig(
    vocab_size=151936, hidden=1024, layers=24, heads=16, kv_heads=4,
    head_dim=128, ffn=4096, rms_eps=1e-6, rope_theta=1000000.0,
    qk_norm="additive",
    layer_types=("linear_attention", "linear_attention",
                 "linear_attention", "full_attention"))


class AdditiveRMSNorm(nn.Module):
    """Ovis AdditiveRmsNorm: x̂ · (1 + weight) (ovisocr2/text.rs:456)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.zeros, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        xhat = (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps))
        return (xhat * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def _rope_tables(cfg: UnifiedLMConfig, position_ids):
    """cos/sin over the ROTARY dims only (partial_rotary · head_dim)."""
    rot = int(cfg.head_dim * cfg.partial_rotary)
    if cfg.rope_kind == "mrope":
        return mrope_cos_sin(position_ids, rot, cfg.mrope_sections,
                             cfg.rope_theta)
    pos = position_ids if position_ids.ndim == 2 else position_ids[0]
    inv = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, rot, 2, dtype=jnp.float32) / rot))
    freqs = pos[..., None].astype(jnp.float32) * inv
    return jnp.cos(freqs), jnp.sin(freqs)


def _apply_rotary(x, cos, sin, *, interleaved: bool):
    """Rotate the first ``2·cos.shape[-1]`` dims of x; pass the rest
    through (partial rotary). Interleaved = GLM's pairwise layout
    (glmocr/text.rs rotate_half_interleaved)."""
    rot = 2 * cos.shape[-1]
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    xf = x_rot.astype(jnp.float32)
    if interleaved:
        x1, x2 = xf[..., 0::2], xf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], -1).reshape(xf.shape)
    else:
        d2 = rot // 2
        x1, x2 = xf[..., :d2], xf[..., d2:]
        out = jnp.concatenate([x1 * cos - x2 * sin,
                               x2 * cos + x1 * sin], -1)
    return jnp.concatenate([out.astype(x.dtype), x_pass], -1)


class UnifiedAttention(nn.Module):
    cfg: UnifiedLMConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, cos, sin, cache: KVCache, pos, mask):
        c = self.cfg
        hd = c.head_dim
        b, t, _ = x.shape
        q = nn.Dense(c.heads * hd, use_bias=c.qkv_bias, dtype=x.dtype,
                     name="q_proj")(x)
        k = nn.Dense(c.kv_heads * hd, use_bias=c.qkv_bias, dtype=x.dtype,
                     name="k_proj")(x)
        v = nn.Dense(c.kv_heads * hd, use_bias=c.qkv_bias, dtype=x.dtype,
                     name="v_proj")(x)
        q = q.reshape(b, t, c.heads, hd)
        k = k.reshape(b, t, c.kv_heads, hd)
        if c.qk_norm == "rms":
            q = RMSNorm(eps=c.rms_eps, name="q_norm")(q)
            k = RMSNorm(eps=c.rms_eps, name="k_norm")(k)
        elif c.qk_norm == "additive":
            q = AdditiveRMSNorm(eps=c.rms_eps, name="q_norm")(q)
            k = AdditiveRMSNorm(eps=c.rms_eps, name="k_norm")(k)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.reshape(b, t, c.kv_heads, hd).transpose(0, 2, 1, 3)
        q = _apply_rotary(q, cos[:, None], sin[:, None],
                          interleaved=c.interleaved_rotary)
        k = _apply_rotary(k, cos[:, None], sin[:, None],
                          interleaved=c.interleaved_rotary)
        cache = cache.append(self.layer_idx, k, v, pos)
        ck, cv = cache.layer(self.layer_idx)
        o = scaled_dot_product_attention(q, ck, cv, mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c.heads * hd)
        return nn.Dense(c.hidden, use_bias=False, dtype=x.dtype,
                        name="o_proj")(o), cache


class GatedDeltaNetLayer(nn.Module):
    """Ovis "linear_attention" mixer — published tree + gated delta rule.

    in_proj_qkv packs [q ‖ k ‖ v] over the linear heads; the depthwise
    causal conv1d (groups = conv_dim) runs over the packed qkv stream;
    per-head gates: β = σ(in_proj_b), decay α = exp(−exp(A_log)·
    softplus(in_proj_a + dt_bias)); output gate z via an RMSNorm-then-
    gate (norm · silu(z)) before out_proj (ovisocr2/text.rs:160-330,
    Qwen3-Next GatedDeltaNet).

    Speculative rollback: the recurrent (dstate, conv_state) folds tokens
    in irreversibly, so a KV-style length trim cannot undo a rejected
    draft. ``collect_states=True`` (the verify-block path,
    exact_models.decode_block_spec) therefore returns the PER-STEP states
    — (B, T, Hv, d, d) and (B, T, K−1, conv_dim) — so the orchestrator can
    resume from the last accepted position exactly. The reference AVOIDS
    this combination (none of its speculative families contain delta
    layers, vl/speculative.py module docstring); here it is solved, which
    is what lets OvisOCR2's hybrid stack ride speculative decoding."""

    cfg: UnifiedLMConfig

    @nn.compact
    def __call__(self, x, dstate, conv_state, collect_states: bool = False,
                 pad_mask=None):
        """``pad_mask`` (B, T) bool, True = real token: LEFT-pad rows
        must not fold into the recurrent state (unlike a KV cache there
        is no per-slot mask to apply later) — pads force decay α=1 and
        update gate β=0 (state carries through EXACTLY, sequential and
        chunked forms alike) and zero the conv stream so early real
        tokens' windows see zeros, identical to the unpadded prefill's
        zero left-pad."""
        from .gated_delta import gated_delta_rule, gated_delta_rule_chunked

        c = self.cfg
        b, t, _ = x.shape
        hk, hv, d = c.linear_k_heads, c.linear_v_heads, c.linear_head_dim
        key_dim, value_dim = hk * d, hv * d
        conv_dim = 2 * key_dim + value_dim
        qkv = nn.Dense(conv_dim, use_bias=False, dtype=x.dtype,
                       name="in_proj_qkv")(x)
        z = nn.Dense(value_dim, use_bias=False, dtype=x.dtype,
                     name="in_proj_z")(x)
        beta_in = nn.Dense(hv, use_bias=False, dtype=x.dtype,
                           name="in_proj_b")(x)
        a_in = nn.Dense(hv, use_bias=False, dtype=x.dtype,
                        name="in_proj_a")(x)
        conv_w = self.param("conv1d.weight", nn.initializers.normal(0.02),
                            (conv_dim, 1, c.conv_kernel))
        dt_bias = self.param("dt_bias", nn.initializers.zeros, (hv,))
        a_log = self.param("A_log", nn.initializers.zeros, (hv,))

        if pad_mask is not None:
            qkv = qkv * pad_mask[:, :, None].astype(qkv.dtype)

        # depthwise causal conv over time with carried state (decode keeps
        # the last K−1 inputs; prefill left-pads zeros)
        kern = conv_w[:, 0].astype(jnp.float32)            # (C, K)
        seq = jnp.concatenate(
            [conv_state, qkv.astype(jnp.float32)], axis=1)  # (B, K-1+T, C)
        idx = jnp.arange(t)[:, None] + jnp.arange(c.conv_kernel)[None]
        windows = seq[:, idx]                               # (B, T, K, C)
        conv_out = jnp.einsum("btkc,ck->btc", windows, kern)
        conv_out = jax.nn.silu(conv_out)
        new_conv_state = seq[:, -(c.conv_kernel - 1):] \
            if c.conv_kernel > 1 else conv_state

        qc = conv_out[..., :key_dim]
        kc = conv_out[..., key_dim:2 * key_dim]
        vc = conv_out[..., 2 * key_dim:]

        def heads(yv, n):
            return yv.reshape(b, t, n, d).transpose(0, 2, 1, 3)

        qh = heads(qc, hk)
        kh = heads(kc, hk)
        vh = heads(vc, hv)
        if hv != hk:                                        # GVA broadcast
            rep = hv // hk
            qh = jnp.repeat(qh, rep, axis=1)
            kh = jnp.repeat(kh, rep, axis=1)
        # Qwen3-Next GDN L2-normalizes q/k before the rule
        qh = qh / jnp.maximum(
            jnp.linalg.norm(qh.astype(jnp.float32), axis=-1,
                            keepdims=True), 1e-12).astype(qh.dtype)
        kh = kh / jnp.maximum(
            jnp.linalg.norm(kh.astype(jnp.float32), axis=-1,
                            keepdims=True), 1e-12).astype(kh.dtype)
        beta = jax.nn.sigmoid(beta_in.astype(jnp.float32))  # (B, T, Hv)
        alpha = jnp.exp(
            -jnp.exp(a_log.astype(jnp.float32))[None, None]
            * jax.nn.softplus(a_in.astype(jnp.float32)
                              + dt_bias[None, None]))
        if pad_mask is not None:
            # pad steps: no update (β=0), no decay (α=1) → S carried
            # through bit-exactly in both rule forms
            beta = beta * pad_mask[:, :, None].astype(beta.dtype)
            alpha = jnp.where(pad_mask[:, :, None], alpha,
                              jnp.ones_like(alpha))
        # prefill rides the chunked/blockwise form (MXU matmuls per
        # chunk, exact vs the sequential scan — SURVEY §7); single-token
        # decode keeps the O(1) step. OAR_TPU_NO_CHUNKED_DELTA falls
        # back to the sequential scan (kill-switch convention).
        import os as _os

        if collect_states:
            # verify-block path: per-step states for speculative rollback
            # (sequential rule — numerically identical to the decode_step
            # path, so greedy-exactness holds across block sizes)
            o, steps = gated_delta_rule(
                qh, kh, vh, alpha.transpose(0, 2, 1),
                beta.transpose(0, 2, 1), initial_state=dstate,
                return_all_states=True)                 # (B, T, Hv, d, d)
            if c.conv_kernel > 1:
                # conv state after step j = the K−1 raw qkv rows ending
                # at j — exactly windows[:, j, 1:] (already materialized)
                step_convs = windows[:, :, 1:, :]       # (B, T, K−1, C)
            else:
                step_convs = jnp.broadcast_to(
                    conv_state[:, None], (b, t) + conv_state.shape[1:])
            s_final, new_conv_state = steps, step_convs
        else:
            rule = (gated_delta_rule
                    if t <= 1 or _os.environ.get("OAR_TPU_NO_CHUNKED_DELTA")
                    else gated_delta_rule_chunked)
            o, s_final = rule(
                qh, kh, vh, alpha.transpose(0, 2, 1),
                beta.transpose(0, 2, 1),
                initial_state=dstate, return_state=True)
        o = o.transpose(0, 2, 1, 3)                         # (B, T, Hv, d)
        gate = z.reshape(b, t, hv, d)
        o = RMSNorm(eps=c.rms_eps, name="norm")(o.astype(x.dtype))
        o = o * jax.nn.silu(gate)
        o = o.reshape(b, t, value_dim)
        return nn.Dense(c.hidden, use_bias=False, dtype=x.dtype,
                        name="out_proj")(o), s_final, new_conv_state


class UnifiedMlp(nn.Module):
    cfg: UnifiedLMConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        if c.fused_gate_up:
            gu = nn.Dense(2 * c.ffn, use_bias=False, dtype=x.dtype,
                          name="gate_up_proj")(x)
            gate, up = gu[..., :c.ffn], gu[..., c.ffn:]
            return nn.Dense(c.hidden, use_bias=False, dtype=x.dtype,
                            name="down_proj")(jax.nn.silu(gate) * up)
        gate = nn.Dense(c.ffn, use_bias=False, dtype=x.dtype,
                        name="gate_proj")(x)
        up = nn.Dense(c.ffn, use_bias=False, dtype=x.dtype,
                      name="up_proj")(x)
        return nn.Dense(c.hidden, use_bias=False, dtype=x.dtype,
                        name="down_proj")(jax.nn.silu(gate) * up)


class UnifiedLayer(nn.Module):
    cfg: UnifiedLMConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, cos, sin, cache, pos, mask, dstate, conv_state,
                 collect_states: bool = False, pad_mask=None):
        c = self.cfg
        h = RMSNorm(eps=c.rms_eps, name="input_layernorm")(x)
        if c.kind(self.layer_idx) == "linear_attention":
            attn, dstate, conv_state = GatedDeltaNetLayer(
                c, name="linear_attn")(h, dstate, conv_state,
                                       collect_states, pad_mask)
        else:
            attn, cache = UnifiedAttention(c, self.layer_idx,
                                           name="self_attn")(
                h, cos, sin, cache, pos, mask)
        if c.sandwich_norms:
            attn = RMSNorm(eps=c.rms_eps,
                           name="post_self_attn_layernorm")(attn)
        x = x + attn
        h = RMSNorm(eps=c.rms_eps, name="post_attention_layernorm")(x)
        m = UnifiedMlp(c, name="mlp")(h)
        if c.sandwich_norms:
            m = RMSNorm(eps=c.rms_eps, name="post_mlp_layernorm")(m)
        return x + m, cache, dstate, conv_state


class UnifiedDecoder(nn.Module):
    """model.* subtree: embed_tokens + layers.{i} + norm (+ separate
    lm_head at the wrapper level)."""

    cfg: UnifiedLMConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden,
                                     name="embed_tokens")
        self.decoder_layers = [
            UnifiedLayer(c, i, name=f"layers.{i}") for i in range(c.layers)]
        self.final_norm = RMSNorm(eps=c.rms_eps, name="norm")

    def empty_states(self, batch: int):
        c = self.cfg
        d = c.linear_head_dim
        dstate = jnp.zeros((c.layers, batch, c.linear_v_heads, d, d),
                           jnp.float32)
        conv_dim = 2 * c.linear_k_heads * d + c.linear_v_heads * d
        conv = jnp.zeros((c.layers, batch, max(c.conv_kernel - 1, 1),
                          conv_dim), jnp.float32)
        return dstate, conv

    def embed(self, ids):
        return self.embed_tokens(ids)

    def __call__(self, embeds, position_ids, cache: KVCache, pos, mask,
                 dstate=None, conv_state=None,
                 collect_states: bool = False, pad_mask=None):
        """``pad_mask`` (B, T) bool, True = real: neutralizes LEFT-pad
        rows in the delta layers' recurrent fold (the state has no
        KV-style per-slot mask to apply later). Callers pass it on
        PREFILL only — decode steps/blocks contain real tokens."""
        c = self.cfg
        _ = self.embed_tokens.embedding     # materialize the table param
        cos, sin = _rope_tables(c, position_ids)
        cos = jnp.asarray(cos, jnp.float32)
        sin = jnp.asarray(sin, jnp.float32)
        if dstate is None or conv_state is None:
            dstate, conv_state = self.empty_states(embeds.shape[0])
        x = embeds
        b, t = embeds.shape[:2]
        step_ds, step_cs = [], []
        for i, layer in enumerate(self.decoder_layers):
            x, cache, ds_i, cs_i = layer(
                x, cos, sin, cache, pos, mask, dstate[i], conv_state[i],
                collect_states, pad_mask)
            if collect_states:
                # per-step states (B, T, …) from DELTA layers only —
                # full-attention layers pass their (unused) input state
                # through unchanged, and broadcasting that constant over T
                # would materialize a multi-hundred-MB transient at real
                # dims (48 layers × 32 heads × 128² f32); the caller
                # scatters the selection back by cfg.delta_layers() index
                if c.kind(i) == "linear_attention":
                    step_ds.append(ds_i)
                    step_cs.append(cs_i)
            else:
                dstate = dstate.at[i].set(ds_i)
                conv_state = conv_state.at[i].set(cs_i)
        if collect_states:
            # (Ld, B, T, …): index [:, :, j] = resume states after step j,
            # rows ordered by cfg.delta_layers()
            if step_ds:
                dstate = jnp.stack(step_ds)
                conv_state = jnp.stack(step_cs)
            else:
                dstate = jnp.zeros((0, b, t) + dstate.shape[2:],
                                   dstate.dtype)
                conv_state = jnp.zeros((0, b, t) + conv_state.shape[2:],
                                       conv_state.dtype)
        return self.final_norm(x), cache, dstate, conv_state


class GlmMtpHead(nn.Module):
    """GLM-OCR's trained MTP draft layer (glmocr/mtp.rs:40-155, the
    DeepSeek-style multi-token-prediction head stored as the checkpoint's
    extra ``layers.{num_layers}`` entry): fuse [enorm(embed(token)) ‖
    hnorm(prev_hidden)] through ``eh_proj``, run ONE full GLM decoder
    layer (same sandwich-norm/partial-rotary topology), then
    ``shared_head.norm`` + ``shared_head.head`` logits. Submodule names
    sit at this module's level exactly as in the checkpoint."""

    cfg: UnifiedLMConfig

    @nn.compact
    def __call__(self, ids, prev_hidden, position_ids, cache: KVCache,
                 pos, mask, emb=None):
        """``emb`` (B, T, hidden), when given, bypasses the internal
        embed — the MTP PREFILL path needs it because prompt image
        positions carry fused vision embeddings, not token ids (pass
        ``ids=None`` there; enorm applies to the embedding either way)."""
        c = self.cfg
        table = nn.Embed(c.vocab_size, c.hidden, name="embed_tokens")
        if emb is None:
            emb = table(ids)
        else:
            # touch the embed once so init() through this path still
            # creates the checkpoint's embed_tokens param (apply()
            # tolerates unused params; init would silently drop it)
            emb = emb + 0 * table(jnp.zeros((1, 1), jnp.int32)).sum()
        e = RMSNorm(eps=c.rms_eps, name="enorm")(emb)
        h = RMSNorm(eps=c.rms_eps, name="hnorm")(prev_hidden)
        x = nn.Dense(c.hidden, use_bias=False, dtype=emb.dtype,
                     name="eh_proj")(jnp.concatenate([e, h], -1))

        # one GLM decoder layer, parts at THIS level (mtp.rs loads the
        # decoder layer from the same vb as enorm/eh_proj)
        cos, sin = _rope_tables(c, position_ids)
        cos = jnp.asarray(cos, jnp.float32)
        sin = jnp.asarray(sin, jnp.float32)
        hn = RMSNorm(eps=c.rms_eps, name="input_layernorm")(x)
        attn, cache = UnifiedAttention(c, 0, name="self_attn")(
            hn, cos, sin, cache, pos, mask)
        if c.sandwich_norms:
            attn = RMSNorm(eps=c.rms_eps,
                           name="post_self_attn_layernorm")(attn)
        x = x + attn
        hn = RMSNorm(eps=c.rms_eps, name="post_attention_layernorm")(x)
        m = UnifiedMlp(c, name="mlp")(hn)
        if c.sandwich_norms:
            m = RMSNorm(eps=c.rms_eps, name="post_mlp_layernorm")(m)
        x = x + m

        out = RMSNorm(eps=c.rms_eps, name="shared_head.norm")(x)
        logits = nn.Dense(c.vocab_size, use_bias=False, dtype=out.dtype,
                          name="shared_head.head")(out)
        return logits.astype(jnp.float32), x, cache


class HpdMtpHead(nn.Module):
    """HPD-Parsing P-MTP draft head (hpd_parsing/model.rs:83-180;
    checkpoint root ``language_model.mtp``): fused = fc(cat(rms(hidden),
    rms(prev-token embedding))), SwiGLU MLP with residual, final norm.
    One ``step`` drafts one token's hidden; the target LM head projects
    it to logits (model.rs:631-636 reuses ``text.lm_logits``)."""

    cfg: UnifiedLMConfig

    @nn.compact
    def __call__(self, hidden, embedding):
        from .paddleocr_vl import RMSNorm

        c = self.cfg
        h = RMSNorm(c.rms_eps, name="pre_fc_norm_hidden")(hidden)
        e = RMSNorm(c.rms_eps, name="pre_fc_norm_embedding")(embedding)
        fused = nn.Dense(c.hidden, use_bias=False,
                         name="fc")(jnp.concatenate([h, e], -1))
        gate = jax.nn.silu(
            nn.Dense(c.ffn, use_bias=False, name="gate_proj")(fused))
        up = nn.Dense(c.ffn, use_bias=False, name="up_proj")(fused)
        mlp = nn.Dense(c.hidden, use_bias=False,
                       name="down_proj")(gate * up)
        return RMSNorm(c.rms_eps, name="norm")(fused + mlp)

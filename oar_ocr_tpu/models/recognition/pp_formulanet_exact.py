"""Exact PP-FormulaNet-S topology — the deploy checkpoint architecture.

The reference drives PP-FormulaNet as an opaque ONNX graph with the
autoregressive loop baked in (oar-ocr-core/src/models/recognition/
pp_formulanet.rs:77-216: preprocess 384×384, mean/std 0.7931/0.1738,
token ids out; sos=0, eos=2 — :30-58). The graph is PaddleOCR's
``PP-FormulaNet-S`` export; this module re-expresses that architecture
with checkpoint-style names:

- backbone: PPHGNetV2-B4 (stem1..4 pad/maxpool stem + HG_Block stages —
  the same exact trunk as RT-DETR's ``PPHGNetV2Det`` arch "L", whose
  stage table (48/128, 96/512, 192/1024·3, 384/2048) IS the B4 config;
  PaddleOCR rec_pphgnetv2.py), final stage flattened to a (B, H·W/1024,
  2048) sequence — ``encoder_hidden_size`` 2048;
- head: MBart causal decoder (PaddleOCR rec_ppformulanet_head.py wraps
  a UniMERNet-style CustomMBart; models/recognition/unimernet.py's
  HF-parity MBartDecoder is reused verbatim) at the published S dims
  decoder_hidden_size=384 / decoder_layers=2 / decoder_ffn_dim=1536 /
  vocab 50000, with ``enc_to_dec_proj`` bridging 2048→384 (the
  VisionEncoderDecoder convention when encoder and decoder widths
  differ);
- decoding: greedy AR; the S variant's ``use_parallel``/
  ``parallel_step=3`` multi-token decode emits parallel_step positions
  per forward (the PP-FormulaNet paper's parallel-step mechanism).

Pinned by public sources: input geometry + normalization + token ids
(reference :30-58), B4 stage table, S head dims, vocab/eos. Inferred
pending real-checkpoint validation (docs/ROADMAP.md exactness
inventory): decoder_attention_heads (16, the MBart default) and the
exact parallel-step query construction.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...runtime.runtime import Runtime, init_params_fast
from ...utils.tracing import stage_timer
from ..detection.rtdetr import PPHGNetV2Det
from .unimernet import MBartDecoder, UniMERNetConfig


@dataclass(frozen=True)
class VaryConfig:
    """Vary_VIT_B tower dims for PP-FormulaNet-L (the FULL Vary tower:
    SAM ViT-B + net_2 + net_3 → 1024ch at stride 64 + mm_projector_vary
    — slanext_exact.VaryVITB with projector=True).  Pinned by byte
    arithmetic on pp-formulanet-l.onnx (730,379,948 bytes = 182.6M f32):
    tower 95.2M + MBart(d=1024, 2 layers, ffn 4096, vocab 50000,
    max_pos 2560, untied-pos) 87.4M = 182.58M — an exact fit; the
    net_2-only SLANeXt tower or a deeper decoder miss by >10MB."""

    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    out_chans: int = 256
    window: int = 14
    global_idx: Tuple[int, ...] = (2, 5, 8, 11)
    net2_out: int = 512
    net3_out: int = 1024
    pos_grid: int = 48          # 768-px training grid


@dataclass(frozen=True)
class PPFormulaNetConfig:
    """PP-FormulaNet-S deploy config (rec_pp_formulanet_s.yml)."""

    image_hw: Tuple[int, int] = (384, 384)
    hg_arch: str = "L"              # HGNetV2-B4 stage table
    vocab_size: int = 50000
    d_model: int = 384              # decoder_hidden_size
    dec_layers: int = 2
    dec_heads: int = 16
    dec_ffn: int = 1536
    encoder_hidden: int = 2048
    max_positions: int = 1536
    sos_id: int = 0
    eos_id: int = 2
    pad_id: int = 1
    parallel_step: int = 3          # use_parallel (S)
    # preprocess (pp_formulanet.rs:30-35)
    norm_mean: float = 0.7931
    norm_std: float = 0.1738
    crop_threshold: int = 200
    padding_multiple: int = 16

    # None → PPHGNetV2 trunk (S/plus-S); set → Vary-ViT tower (L)
    vary: Optional["VaryConfig"] = None

    def tiny(self) -> "PPFormulaNetConfig":
        return dataclasses.replace(
            self, image_hw=(64, 64), hg_arch="T", vocab_size=64,
            d_model=32, dec_layers=2, dec_heads=4, dec_ffn=48,
            encoder_hidden=256, max_positions=64)

    def large(self) -> "PPFormulaNetConfig":
        """PP-FormulaNet-L (rec_pp_formulanet_l.yml): Vary_VIT_B encoder
        at 768×768, MBart d_model 1024 / 2 layers / ffn 4096; encoder
        width equals decoder width so there is no enc_to_dec_proj; the
        L variant decodes strictly token-by-token (use_parallel off)."""
        return dataclasses.replace(
            self, image_hw=(768, 768), d_model=1024, dec_layers=2,
            dec_heads=16, dec_ffn=4096, encoder_hidden=1024,
            max_positions=2560, parallel_step=1, vary=VaryConfig())

    def tiny_large(self) -> "PPFormulaNetConfig":
        """Small-dims L-shape for parity tests (vary tower + no proj)."""
        return dataclasses.replace(
            self, image_hw=(32, 32), vocab_size=64, d_model=24,
            dec_layers=2, dec_heads=4, dec_ffn=48, encoder_hidden=24,
            max_positions=64, parallel_step=1,
            vary=VaryConfig(patch=8, dim=16, depth=4, heads=2,
                            out_chans=12, window=2, global_idx=(1, 3),
                            net2_out=20, net3_out=24, pos_grid=4))

    def mbart(self) -> UniMERNetConfig:
        return dataclasses.replace(
            UniMERNetConfig(), vocab_size=self.vocab_size,
            d_model=self.d_model, dec_layers=self.dec_layers,
            dec_heads=self.dec_heads, dec_ffn=self.dec_ffn,
            max_positions=self.max_positions, sos_id=self.sos_id,
            eos_id=self.eos_id)


class PPFormulaNetModule(nn.Module):
    """backbone + enc_to_dec_proj + MBart decoder under checkpoint
    roots ``backbone`` / ``head.enc_to_dec_proj`` / ``head.decoder``."""

    cfg: PPFormulaNetConfig

    def setup(self):
        c = self.cfg
        if c.vary is not None:
            from .slanext_exact import VaryVITB

            v = c.vary
            self.backbone = VaryVITB(
                patch=v.patch, dim=v.dim, depth=v.depth, heads=v.heads,
                out_chans=v.out_chans, window=v.window,
                global_idx=v.global_idx, net2_out=v.net2_out,
                net3_out=v.net3_out, pos_grid=v.pos_grid,
                projector=True, name="backbone")
        else:
            self.backbone = PPHGNetV2Det(arch=c.hg_arch, return_idx=(3,),
                                         name="backbone")
        # the VisionEncoderDecoder bridge exists only when widths differ
        # (absent in -L where the Vary projector already emits d_model)
        self.enc_to_dec_proj = (
            nn.Dense(c.d_model, name="head.enc_to_dec_proj")
            if c.encoder_hidden != c.d_model else None)
        self.decoder = MBartDecoder(c.mbart(),
                                    name="head.decoder.model.decoder")

    def encode(self, x):
        if self.cfg.vary is not None:
            seq = self.backbone(x)                    # (B, N, C) projected
        else:
            (f,) = self.backbone(x)                   # (B, H/32, W/32, C)
            b, h, w, ch = f.shape
            seq = f.reshape(b, h * w, ch)
        if self.enc_to_dec_proj is not None:
            seq = self.enc_to_dec_proj(seq)
        return seq

    def decode(self, ids, enc):
        return self.decoder(ids, enc)

    def __call__(self, x, ids):
        return self.decode(ids, self.encode(x))


def _decode_bucket(n: int) -> int:
    """Pow2 decode-length buckets (decoder_graph.rs:14 analog) — keeps
    the per-shape compile count at ~5 for a whole formula."""
    for b in (8, 16, 32, 64, 128, 256):
        if n <= b:
            return b
    return n


class PPFormulaNetRecognizer:
    """Crop → 384×384 normalized input → greedy LaTeX token decode
    (margin crop + pad-to-multiple preprocess per
    processors/formula_preprocess.rs semantics, already in formula.py)."""

    def __init__(self, params=None, *,
                 cfg: Optional[PPFormulaNetConfig] = None,
                 vocab: Optional[Sequence[str]] = None,
                 runtime: Optional[Runtime] = None, seed: int = 0):
        import functools

        self.cfg = cfg or PPFormulaNetConfig()
        self.runtime = runtime or Runtime.default()
        self.vocab = list(vocab) if vocab else None
        self.module = PPFormulaNetModule(self.cfg)
        if params is None:
            c = self.cfg
            params = self.module.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, *c.image_hw, 3), jnp.float32),
                jnp.zeros((1, 1), jnp.int32))
        self.params = jax.device_put(params, self.runtime.device)
        self._encode = jax.jit(functools.partial(
            self.module.apply, method=PPFormulaNetModule.encode))
        self._decode = jax.jit(functools.partial(
            self.module.apply, method=PPFormulaNetModule.decode))

    def preprocess(self, image: np.ndarray) -> np.ndarray:
        import cv2

        from .formula import crop_formula_margins

        c = self.cfg
        img = crop_formula_margins(image, thresh=c.crop_threshold)
        h, w = c.image_hw
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        x = img.astype(np.float32) / 255.0
        return (x - c.norm_mean) / c.norm_std

    def recognize(self, crops: Sequence[np.ndarray], *,
                  max_new_tokens: int = 96) -> List[str]:
        c = self.cfg
        out = []
        step = max(c.parallel_step, 1)
        for crop in crops:
            x = self.preprocess(crop)[None]
            with stage_timer("formula.encode"):
                enc = self._encode(self.params, jnp.asarray(x))
            ids: List[int] = [c.sos_id]
            done = False
            while len(ids) - 1 < max_new_tokens and not done:
                # parallel-step decode: read the logits of the last
                # `parallel_step` query positions per forward (S emits
                # several tokens per step; step=1 is plain AR). The query
                # is right-padded to a pow2 LENGTH BUCKET so decode
                # compiles once per bucket instead of once per emitted
                # token group (slow remote-compile tunnel, CLAUDE.md);
                # causal self-attention makes the pad tail inert for all
                # read positions.
                query = ids + [c.pad_id] * (step - 1)
                blen = _decode_bucket(len(query))
                query = query + [c.pad_id] * (blen - len(query))
                logits = self._decode(
                    self.params,
                    jnp.asarray(np.asarray(query, np.int32))[None], enc)
                nxt = np.asarray(jnp.argmax(
                    logits[0, len(ids) - 1 : len(ids) - 1 + step],
                    axis=-1))
                for tok in nxt[:step].tolist():
                    if tok == c.eos_id or tok >= c.vocab_size:
                        done = True
                        break
                    ids.append(tok)
                    if len(ids) - 1 >= max_new_tokens:
                        break
            toks = ids[1:]
            if self.vocab:
                out.append(" ".join(self.vocab[t] for t in toks
                                    if t < len(self.vocab)))
            else:
                out.append(" ".join(f"⟨{t}⟩" for t in toks))
        return out


class PPFormulaNetExactAdapter:
    """Pipeline-facing adapter: same ``recognize → FormulaResult`` contract
    as formula.FormulaRecognizer, backed by the exact topology."""

    def __init__(self, params=None, *, cfg=None, vocab=None, runtime=None,
                 seed: int = 0):
        self.rec = PPFormulaNetRecognizer(params, cfg=cfg, vocab=vocab,
                                          runtime=runtime, seed=seed)

    def recognize(self, crops: Sequence[np.ndarray]):
        from .formula import FormulaResult, normalize_latex

        return [FormulaResult(latex=normalize_latex(t), score=1.0)
                for t in self.rec.recognize(crops)]


def build_formulanet_map(params, *, name: str = "pp-formulanet"):
    """Official-name ConversionMap for the PP-FormulaNet deploy
    checkpoints: Paddle walker names throughout, with the HF-Linear
    (out, in) transpose inside the MBart decoder subtree — the deploy
    export stores the decoder in HF layout (the same mixed map
    tests/test_formulanet_parity.py validates inline against the
    official transformers MBart oracle)."""
    from ...runtime.ppocr_maps import (_conv_oihw_to_hwio, _hf_dense,
                                       ppocr_name)
    from ...runtime.weights import ConversionMap, flatten_params

    cm = ConversionMap(name)
    for key, value in flatten_params(params).items():
        source = ppocr_name(key)
        transform = None
        if "head.decoder" in key:
            if key.endswith("/kernel") and np.ndim(value) == 2:
                transform = _hf_dense
        elif key.endswith("/kernel") and np.ndim(value) == 4:
            transform = _conv_oihw_to_hwio
        cm.map(key, source, transform)
    return cm

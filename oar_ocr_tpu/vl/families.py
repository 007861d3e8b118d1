"""The VLM family lineup over the shared decoder core.

Re-expresses oar-ocr-vl's per-model families (SURVEY §2.5) on the shared
`CausalLM` (vl/decoder.py) + `VisionTower` + generation harness:

| Family            | Distinctive subsystem here                            |
|-------------------|-------------------------------------------------------|
| PaddleOCR-VL      | vl/model.py (Ernie + 3-D MRoPE, scan decode)          |
| HunyuanOCR        | XDRoPE decoder + DFlash block-draft speculation       |
| GLM-OCR           | MTP recurrent draft layer + single-pass verify        |
| MinerU2.5         | Qwen2-VL-style MRoPE decoder, two-step layout→extract |
| MinerU-Diffusion  | SDAR block-diffusion decode (vl/diffusion.py)         |
| HPD-Parsing       | <FORK> branch scheduler w/ shared-prefix KV           |
| OvisOCR2          | hybrid gated-delta + full-attention layers            |
| MonkeyOCRv2       | task-prompted E2E/layout/table(OTSL)/formula          |

All families share the vision tower, projector, prompt assembly, KV-cache
generation harness, and tokenizer plumbing; each class adds only its
mechanism. Development-size configs (`.tiny()`) run everything without
converted weights; real sizes load through runtime/weights.py.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..errors import InvalidInputError
from ..runtime.runtime import Runtime
from ..utils.tracing import stage_timer
from .attention import (combine_masks, create_causal_mask,
                        create_left_padding_mask)
from .decoder import CausalLM, DecoderConfig
from .dflash import DFlashConfig, DFlashDraft
from .kv_cache import KVCache, decoder_cache_capacity
from .paged_kv import PagedKVCache, page_bucket
from .model import ByteTokenizer
from .paddleocr_vl import SwiGLU
from .attention import scaled_dot_product_attention


class VisionBlock(nn.Module):
    """Generic pre-LN ViT block shared by the family vision towers
    (each family's REAL tower replaces this as its exact architecture
    lands — PaddleOCR-VL's is in paddleocr_vl.py)."""

    heads: int

    @nn.compact
    def __call__(self, x, mask, valid_len=None):
        import os

        d = x.shape[-1]
        h = nn.LayerNorm(dtype=x.dtype)(x)
        b, t, _ = h.shape
        hd = d // self.heads
        qkv = nn.Dense(3 * d, dtype=x.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, -1)
        shp = (b, t, self.heads, hd)
        q = q.reshape(shp).transpose(0, 2, 1, 3)
        k = k.reshape(shp).transpose(0, 2, 1, 3)
        v = v.reshape(shp).transpose(0, 2, 1, 3)
        from .paddleocr_vl import ATTN_FULL_SEQ_THRESHOLD

        use_flash = (t > ATTN_FULL_SEQ_THRESHOLD
                     or bool(os.environ.get("OAR_TPU_FLASH_VISION"))) \
            and not os.environ.get("OAR_TPU_DISABLE_PALLAS")
        if valid_len is not None and use_flash:
            # memory guard: above the reference's 8192-token threshold the
            # full (T, T) score matrix would thrash HBM (vision.rs:12);
            # the Pallas online-softmax kernel is the default there
            from ..ops.flash_attention import flash_attention

            o = flash_attention(q, k, v, valid_len=valid_len)
        else:
            o = scaled_dot_product_attention(q, k, v, mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=x.dtype, name="proj")(o)
        h = nn.LayerNorm(dtype=x.dtype)(x)
        x = x + SwiGLU(d * 4)(h)
        return x
from .speculative import verify_draft


@dataclass(frozen=True)
class VisionConfig:
    dim: int = 1024
    layers: int = 24
    heads: int = 16
    patch: int = 14
    merge: int = 2

    def tiny(self) -> "VisionConfig":
        return dataclasses.replace(self, dim=64, layers=2, heads=4)


@dataclass(frozen=True)
class FamilyConfig:
    name: str
    decoder: DecoderConfig
    vision: VisionConfig
    tasks: Tuple[str, ...] = ("ocr",)
    prompt_templates: Optional[Dict[str, str]] = None
    # smart_resize area bounds (None → VisionProcessorConfig defaults);
    # task_min_pixels raises the floor for specific tasks (MonkeyOCRv2
    # Layout's LAYOUT_MIN_PIXELS, monkeyocrv2/model.rs:18,166)
    min_pixels: Optional[int] = None
    max_pixels: Optional[int] = None
    task_min_pixels: Optional[Dict[str, int]] = None
    # HunyuanOCR V1 resize policy (hunyuanocr/processing.rs:97-108):
    # token cap Hm·(Wm+1) ≤ img_max_tokens, then longer side clamped to
    # max_image_size. Both read from the checkpoint's config.json at
    # conversion time; None (V1.5) = plain smart_resize.
    img_max_tokens: Optional[int] = None
    max_image_size: Optional[int] = None
    # mechanism knobs
    draft_len: int = 0              # speculation block size (0 = greedy)
    # HunyuanOCR: the real DFlash block draft (vl/dflash.py). When set it
    # replaces the generic MTP layer in generate_speculative.
    dflash: Optional[DFlashConfig] = None
    diffusion_block: int = 0        # SDAR block length (0 = AR)
    fork_token: str = "<FORK>"
    max_active_branches: int = 64   # hpd_parsing/model.rs:23-41

    def tiny(self) -> "FamilyConfig":
        return dataclasses.replace(
            self, decoder=self.decoder.tiny(),
            vision=self.vision.tiny(),
            dflash=None if self.dflash is None else self.dflash.tiny(
                vocab_size=256, hidden=64, heads=4, kv_heads=2, head_dim=16))


# Official OvisOCR2 instruction — the leading newline is part of the
# prompt (ovisocr2/model.rs:20 DEFAULT_PROMPT; docs/usage.md:397-404).
OVIS_OCR2_PROMPT = (
    "\nExtract all readable content from the image in natural human "
    "reading order and output the result as a single Markdown document. "
    "For charts or images, represent them using an HTML image tag: "
    '<img src="images/bbox_{left}_{top}_{right}_{bottom}.jpg" />, where '
    "left, top, right, bottom are bounding box coordinates scaled to "
    "[0, 1000). Format formulas as LaTeX. Format tables as HTML: "
    "<table>...</table>. Transcribe all other text as standard Markdown. "
    "Preserve the original text without translation or paraphrasing.")


FAMILY_CONFIGS: Dict[str, FamilyConfig] = {
    "hunyuanocr": FamilyConfig(
        "hunyuanocr",
        # 24 layers: the published DFlash taps reach 0-based 22 and the
        # reference errors on id >= num_hidden_layers (model.rs:489-501)
        DecoderConfig(vocab_size=128000, hidden=2048, layers=24, heads=16,
                      kv_heads=4, ffn=6144, rope_kind="xdrope"),
        VisionConfig(), tasks=("ocr", "table", "formula"), draft_len=8,
        dflash=DFlashConfig(),
        # V1 resize policy: Hm·(Wm+1) token cap + 2048 long-side clamp
        # (hunyuanocr/processing.rs:97-108; conversion overrides from
        # config.json — a V1.5 checkpoint sets img_max_tokens=None).
        # The pixel budget must exceed the token cap's implied area
        # (4096 tokens · factor² ≈ 3.2 MPx) or the cap is dead code —
        # the V1.5 processor budget is 16 MPx (processing.rs:111).
        min_pixels=32 * 32, max_pixels=16_777_216,
        img_max_tokens=4096, max_image_size=2048),
    "glmocr": FamilyConfig(
        "glmocr",
        DecoderConfig(vocab_size=151552, hidden=1536, layers=24, heads=12,
                      kv_heads=2, ffn=4608, rope_kind="mrope"),
        VisionConfig(), tasks=("ocr", "table", "formula"), draft_len=4),
    "mineru": FamilyConfig(
        "mineru",
        DecoderConfig(vocab_size=151936, hidden=1536, layers=28, heads=12,
                      kv_heads=2, ffn=8960, rope_kind="mrope"),
        VisionConfig(), tasks=("layout", "extract", "ocr", "table")),
    "mineru_diffusion": FamilyConfig(
        "mineru_diffusion",
        DecoderConfig(vocab_size=151936, hidden=2048, layers=24, heads=16,
                      kv_heads=2, ffn=8192, rope_kind="mrope"),
        VisionConfig(), tasks=("ocr",), diffusion_block=16,
        # official single-pass prompt (mineru_diffusion/model.rs:33)
        prompt_templates={"ocr": "\nText Recognition:"}),
    "hpd_parsing": FamilyConfig(
        "hpd_parsing",
        DecoderConfig(vocab_size=92553, hidden=1024, layers=24, heads=16,
                      kv_heads=8, ffn=4096, rope_kind="rope"),
        VisionConfig(patch=14, merge=1), tasks=("parse",), draft_len=6,
        # official fork-enabled page prompt (hpd_parsing/model.rs:17)
        prompt_templates={"parse": "document parsing with fork."}),
    "ovisocr2": FamilyConfig(
        "ovisocr2",
        DecoderConfig(vocab_size=151936, hidden=1024, layers=24, heads=16,
                      kv_heads=4, ffn=4096, rope_kind="rope",
                      layer_pattern=("delta", "delta", "delta", "attn")),
        VisionConfig(), tasks=("markdown",),
        # official prompt (leading newline included) + 448²..2880² area
        # bounds (ovisocr2/model.rs:20 DEFAULT_PROMPT,
        # config.rs:457 runtime_pixel_bounds)
        prompt_templates={"markdown": OVIS_OCR2_PROMPT},
        min_pixels=448 * 448, max_pixels=2880 * 2880),
    "monkeyocrv2": FamilyConfig(
        "monkeyocrv2",
        DecoderConfig(vocab_size=151936, hidden=896, layers=24, heads=14,
                      kv_heads=2, ffn=4864, rope_kind="mrope"),
        VisionConfig(dim=384, layers=12, heads=6),
        tasks=("end2end", "layout", "text", "table", "formula"),
        # the five official task prompts (monkeyocrv2/model.rs:36-52)
        prompt_templates={
            "layout": "Please output the categories and coordinates of "
                      "the document elements in reading order.",
            "end2end": "List the document elements in reading order, "
                       "including their categories, coordinates, and the "
                       "content of each element.",
            "text": "Please output the text content from the image.",
            "formula": "Please write out the expression of the formula in "
                       "the image using LaTeX format.",
            "table": "Please extract the table from the image and "
                     "represent it in OTSL format.",
        },
        # layout pass raises the pixel floor (model.rs:18 LAYOUT_MIN_PIXELS)
        task_min_pixels={"layout": 1_003_520}),
}


class VisionTower(nn.Module):
    """Patch embed + ViT stack (shared across families)."""

    cfg: VisionConfig

    @nn.compact
    def __call__(self, patches, valid):
        c = self.cfg
        x = nn.Dense(c.dim, dtype=patches.dtype, name="patch_embed")(patches)
        mask = valid[:, None, None, :]
        vlen = jnp.sum(valid.astype(jnp.int32), -1)
        for _ in range(c.layers):
            x = VisionBlock(c.heads)(x, mask, vlen)
        return nn.LayerNorm(dtype=x.dtype)(x)


class MTPDraftLayer(nn.Module):
    """One multi-token-prediction draft layer, reused recurrently (GLM-OCR
    mtp.rs:1-6): (prev hidden, prev token) → (next hidden, next logits).
    For DFlash-style block drafting the same layer rolls K times from the
    target's last hidden state."""

    hidden: int
    vocab_size: int

    @nn.compact
    def __call__(self, h, tok):
        emb = nn.Embed(self.vocab_size, self.hidden, name="draft_emb")(tok)
        x = jnp.concatenate([h, emb], -1)
        x = nn.Dense(self.hidden, name="fuse")(x)
        x = jax.nn.silu(x)
        x = x + nn.Dense(self.hidden, name="mix")(jax.nn.silu(
            nn.Dense(self.hidden * 2, name="up")(x))[..., : self.hidden])
        logits = nn.Dense(self.vocab_size, name="draft_head")(x)
        return x, logits.astype(jnp.float32)


class FamilyModule(nn.Module):
    """Vision tower + merge projector + CausalLM in one param tree."""

    cfg: FamilyConfig

    def setup(self):
        self.vision = VisionTower(self.cfg.vision)
        self.lm = CausalLM(self.cfg.decoder)
        self.v_proj_1 = nn.Dense(self.cfg.decoder.hidden * 2, name="vp1")
        self.v_proj_2 = nn.Dense(self.cfg.decoder.hidden, name="vp2")
        if self.cfg.dflash is not None:
            self.dflash = DFlashDraft(self.cfg.dflash, name="dflash")
        elif self.cfg.draft_len > 0:
            self.mtp = MTPDraftLayer(self.cfg.decoder.hidden,
                                     self.cfg.decoder.vocab_size,
                                     name="mtp")

    def encode_vision(self, patches, valid):
        x = self.vision(patches, valid)
        m2 = self.cfg.vision.merge ** 2
        b, t, d = x.shape
        if m2 > 1:
            x = x.reshape(b, t // m2, m2 * d)
        return self.v_proj_2(jax.nn.gelu(self.v_proj_1(x)))

    def embed_tokens(self, ids):
        return self.lm.embed_tokens(ids)

    def prefill(self, embeds, position_ids, cache, mask, dstate=None,
                pad_mask=None):
        return self.lm.prefill(embeds, position_ids, cache, mask, dstate,
                               pad_mask=pad_mask)

    def decode_step(self, tok_ids, position_ids, cache, pos,
                    dstate=None):
        return self.lm.decode_step(tok_ids, position_ids, cache, pos,
                                   dstate)

    def decode_block(self, tok_ids, position_ids, cache, pos):
        return self.lm.decode_block(tok_ids, position_ids, cache, pos)

    def decode_block_bidir(self, tok_ids, position_ids, cache, pos):
        return self.lm.decode_block_bidir(tok_ids, position_ids, cache, pos)

    def draft_step(self, h, tok):
        return self.mtp(h, tok)

    # --------------------- DFlash (HunyuanOCR) ---------------------

    def _aux_taps(self):
        """DFlash config ids are 0-based layer indices; the LM's aux
        machinery takes 1-based post-layer taps (llm.rs id+1). Ids out
        of range are a config error, never silently dropped (a filter
        would change fc's input width vs converted draft weights)."""
        d = self.cfg.dflash
        c = self.cfg.decoder
        bad = [i for i in d.target_layer_ids if not 0 <= i < c.layers]
        if bad:
            raise InvalidInputError(
                "DFlash target_layer_ids out of range for target",
                bad=bad, layers=c.layers)
        return tuple(i + 1 for i in d.target_layer_ids)

    def prefill_aux(self, embeds, position_ids, cache, mask):
        return self.lm.prefill_aux(embeds, position_ids, cache, mask,
                                   self._aux_taps())

    def decode_block_aux(self, tok_ids, position_ids, cache, pos):
        return self.lm.decode_block_aux(tok_ids, position_ids, cache, pos,
                                        self._aux_taps())

    def dflash_context_rows(self, aux_hidden, start):
        return self.dflash.context_rows(aux_hidden, start)

    def dflash_proposals(self, bonus_tok, ctx_cache: PagedKVCache,
                         n_pages: int, start):
        """Draft one block: [bonus embed, mask embeds], non-causal pass,
        rows 1.. through the TARGET LM head → argmax proposals
        (dflash.rs proposals_from_hidden:1166-1181)."""
        d = self.cfg.dflash
        b = bonus_tok.shape[0]
        mask_ids = jnp.full((b, d.block_size - 1), d.mask_token_id,
                            jnp.int32)
        q_ids = jnp.concatenate([bonus_tok[:, None], mask_ids], axis=1)
        q_emb = self.lm.embed_tokens(q_ids)
        hidden = self.dflash.draft_hidden(q_emb, ctx_cache, n_pages, start)
        logits = self.lm.logits_for(hidden[:, 1:])
        return jnp.argmax(logits, -1).astype(jnp.int32)

    def init_all(self, patches, valid, ids, position_ids):
        img = self.encode_vision(patches, valid)
        emb = self.embed_tokens(ids)
        c = self.cfg.decoder
        b, t = ids.shape
        cache = KVCache.create(c.layers, b, c.kv_heads, t, c.head_dim,
                               dtype=emb.dtype)
        logits, _, _, _ = self.prefill(emb, position_ids,
                                       cache, jnp.ones((b, 1, t, t), bool))
        if self.cfg.dflash is not None:
            d = self.cfg.dflash
            aux = jnp.zeros((b, 2, c.hidden * len(d.target_layer_ids)),
                            emb.dtype)
            _k, _v = self.dflash.context_rows(aux, 0)
            ctx = PagedKVCache.create(d.layers, b, d.kv_heads, 1,
                                      d.page_size, d.head_dim,
                                      dtype=emb.dtype)
            self.dflash_proposals(jnp.zeros((b,), jnp.int32), ctx, 1,
                                  jnp.int32(0))
        elif self.cfg.draft_len > 0:
            _h, _l = self.mtp(jnp.zeros((b, c.hidden)),
                              jnp.zeros((b,), jnp.int32))
        return img, logits


def _empty_dstate(cfg: FamilyConfig, batch: int) -> jnp.ndarray:
    c = cfg.decoder
    return jnp.zeros((c.layers, batch, c.heads, c.head_dim, c.head_dim),
                     jnp.float32)


class VLMFamily:
    """Generation harness shared by every family (greedy scan decode; the
    PaddleOCR-VL orchestration generalized)."""

    IMAGE_PAD_ID = 3
    IMAGE_START_ID = 4
    IMAGE_END_ID = 5

    def __init__(self, cfg: FamilyConfig, params=None, *, tokenizer=None,
                 runtime: Optional[Runtime] = None, seed: int = 0):
        self.cfg = cfg
        self.runtime = runtime or Runtime.default()
        self.tokenizer = tokenizer or ByteTokenizer()
        self.module = FamilyModule(cfg)
        if params is None:
            params = self._init_params(seed)
        self.params = self.runtime.put_params_vl(params)
        self._encode_vision = jax.jit(functools.partial(
            self.module.apply, method=FamilyModule.encode_vision))
        self._embed = jax.jit(functools.partial(
            self.module.apply, method=FamilyModule.embed_tokens))
        # text-embed + image-span scatter in ONE device program — the
        # fused (B, T, hidden) embedding never round-trips the tunnel
        # (same rationale as PaddleOCRVL._fuse_embeds_impl)
        self._fuse = jax.jit(self._fuse_impl)
        self._gen = jax.jit(self._generate_impl,
                            static_argnames=("max_new", "capacity"))
        # per-instance jit cache: a fresh jax.jit(functools.partial(...))
        # has a new callable identity, so building one inside a per-image
        # loop retraces + re-lowers EVERY image — minutes per shape on
        # the remote-compile tunnel (same fix as ExactVLM._cached_jit)
        self._jits: Dict = {}

    def _cached_jit(self, key, factory):
        fn = self._jits.get(key)
        if fn is None:
            fn = self._jits[key] = factory()
        return fn

    def _init_params(self, seed):
        c = self.cfg
        rng = jax.random.PRNGKey(seed)
        m2 = c.vision.merge ** 2
        patches = jnp.zeros((1, m2, c.vision.patch ** 2 * 3), jnp.float32)
        valid = jnp.ones((1, m2), bool)
        ids = jnp.zeros((1, 4), jnp.int32)
        pos = jnp.zeros((3, 1, 4), jnp.int32)
        return self.module.init(rng, patches, valid, ids, pos,
                                method=FamilyModule.init_all)

    def _fuse_impl(self, params, ids, img_embeds, starts, counts):
        embeds = self.module.apply(params, ids,
                                   method=FamilyModule.embed_tokens)
        t = ids.shape[1]
        ti = img_embeds.shape[1]
        idx = jnp.arange(t)[None, :] - starts[:, None]          # (B, T)
        take = (idx >= 0) & (idx < counts[:, None])
        gathered = jnp.take_along_axis(
            img_embeds, jnp.clip(idx, 0, ti - 1)[:, :, None], axis=1)
        return jnp.where(take[:, :, None],
                         gathered.astype(embeds.dtype), embeds)

    # ------------------------- generation -------------------------
    def _generate_impl(self, params, embeds, position_ids, valid_lengths,
                       *, max_new: int, capacity: int):
        c = self.cfg.decoder
        b, t, _ = embeds.shape
        cache = KVCache.create(c.layers, b, c.kv_heads, capacity, c.head_dim,
                               dtype=embeds.dtype)
        cache = cache.with_pad(t - valid_lengths)
        causal = create_causal_mask(t)
        pad = create_left_padding_mask(valid_lengths, t)
        full = jnp.broadcast_to(combine_masks(causal, pad), (b, 1, t, t))
        full = jnp.concatenate(
            [full, jnp.zeros((b, 1, t, capacity - t), bool)], -1)
        dstate0 = _empty_dstate(self.cfg, b)
        # neutralize LEFT-pad rows in any delta layers' recurrent fold
        # (True = real token; the state has no per-slot mask)
        pm = jnp.arange(t)[None, :] >= (t - valid_lengths)[:, None]
        logits, _, cache, dstate = self.module.apply(
            params, embeds, position_ids, cache, full, dstate0,
            method=FamilyModule.prefill, pad_mask=pm)
        cache = cache.advance(t)
        first = jnp.argmax(logits, -1).astype(jnp.int32)
        next_pos = jnp.max(position_ids, axis=(0, 2)) + 1

        def step(carry, i):
            tok, cache, done, npos, dstate = carry
            pos_ids = jnp.broadcast_to(npos[None, :, None], (3, b, 1))
            logits, _, cache, dstate = self.module.apply(
                params, tok, pos_ids, cache, t + i, dstate,
                method=FamilyModule.decode_step)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            nxt = jnp.where(done, c.eos_id, nxt)
            done = done | (nxt == c.eos_id)
            return (nxt, cache, done, npos + 1, dstate), tok

        (_, _, _, _, _), ids = jax.lax.scan(
            step, (first, cache, first == c.eos_id, next_pos, dstate),
            jnp.arange(max_new), length=max_new)
        return jnp.transpose(ids, (1, 0))

    # ------------------- speculative generation (batch-1) -------------------
    def _spec_round_impl(self, params, h, tok, cache, cpos, wpos, *, k: int):
        """One draft→verify round: MTP-draft K tokens, verify in a single
        causal target pass, roll the cache back to the accepted length."""

        b = tok.shape[0]

        def draft_body(carry, _):
            hh, tt = carry
            hh, logits = self.module.apply(params, hh, tt,
                                           method=FamilyModule.draft_step)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (hh, nxt), nxt

        (_, _), drafts = jax.lax.scan(draft_body, (h, tok), None, length=k)
        drafts = jnp.transpose(drafts, (1, 0))               # (B, K)

        block = jnp.concatenate([tok[:, None], drafts], 1)   # (B, K+1)
        pos_ids = (cpos[None, :, None]
                   + jnp.arange(k + 1)[None, None, :])       # (3-free rope)
        pos_ids = jnp.broadcast_to(pos_ids, (3, b, k + 1))
        prev_len = cache.length
        logits, hidden, cache = self.module.apply(
            params, block, pos_ids, cache, wpos,
            method=FamilyModule.decode_block)
        res = verify_draft(drafts, logits)
        a = res.accepted                                     # (B,)
        cache = cache.trim_to(prev_len[0] + 1 + a[0])
        h_next = hidden[jnp.arange(b), a]
        next_tok = jnp.take_along_axis(res.next_tokens, a[:, None],
                                       axis=1)[:, 0]
        return res.next_tokens, a, h_next, next_tok, cache

    def generate_speculative(self, images: Sequence[np.ndarray],
                             task: Optional[str] = None, *,
                             max_new_tokens: int = 256) -> List[str]:
        """Greedy-equivalent speculative decoding (exactness-preserving:
        output matches `generate` token for token; only latency differs).
        Batch-1, matching the reference's batch-1 decode focus."""

        import os

        # kill switch, mirroring the reference's per-feature env switches
        # (docs/environment-variables.md; e.g. speculative-decoding off)
        if (self.cfg.draft_len <= 0
                or os.environ.get("OAR_TPU_DISABLE_SPECULATION")):
            return self.generate(images, task, max_new_tokens=max_new_tokens)
        if self.cfg.dflash is not None:
            return self._generate_dflash(images, task,
                                         max_new_tokens=max_new_tokens)
        task = task or self.cfg.tasks[0]
        out: List[str] = []
        for image in images:
            embeds, positions, valid_lengths, max_len = self._build_inputs(
                [image], task)
            c = self.cfg.decoder
            k = self.cfg.draft_len
            capacity = decoder_cache_capacity(
                max_len, max_new_tokens + k + 1)
            cache = KVCache.create(c.layers, 1, c.kv_heads, capacity,
                                   c.head_dim, dtype=embeds.dtype)
            b, t = 1, max_len
            cache = cache.with_pad(t - jnp.asarray(valid_lengths))
            causal = create_causal_mask(t)
            pad = create_left_padding_mask(jnp.asarray(valid_lengths), t)
            full = jnp.broadcast_to(combine_masks(causal, pad), (b, 1, t, t))
            full = jnp.concatenate(
                [full, jnp.zeros((b, 1, t, capacity - t), bool)], -1)
            logits, hidden, cache, _ds = self._cached_jit(
                "prefill", lambda: jax.jit(functools.partial(
                    self.module.apply, method=FamilyModule.prefill)))(
                self.params, embeds, positions, cache, full)
            cache = cache.advance(t)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            h = hidden[:, -1].astype(jnp.float32)
            cpos = jnp.max(positions, axis=(0, 2)) + 1
            wpos = t

            spec_round = self._cached_jit(
                ("spec_round", k), lambda: jax.jit(functools.partial(
                    self._spec_round_impl, k=k)))
            ids: List[int] = [int(tok[0])]
            while len(ids) < max_new_tokens and ids[-1] != c.eos_id:
                emitted, a, h, tok, cache = spec_round(
                    self.params, h, tok, cache, cpos, wpos)
                n_acc = int(a[0])
                for v in np.asarray(emitted)[0, : n_acc + 1].tolist():
                    ids.append(int(v))
                    if v == c.eos_id or len(ids) >= max_new_tokens:
                        break
                cpos = cpos + 1 + n_acc
                wpos = wpos + 1 + n_acc
            out.append(self._detok(ids))
        return out

    # --------------------- DFlash generation (batch-1) ---------------------
    def _dflash_round_impl(self, params, tok, cache, ctx, cpos, wpos,
                           *, n_pages: int):
        """One DFlash round: block draft (1 draft fwd) → causal target
        verify (1 target fwd) → cache rollback → append the verified rows'
        aux hiddens to the draft context (dflash.rs decode loop)."""
        d = self.cfg.dflash
        b = tok.shape[0]
        k = d.block_size - 1
        drafts = self.module.apply(
            params, tok, ctx, n_pages, ctx.length[0],
            method=FamilyModule.dflash_proposals)          # (B, K)
        block = jnp.concatenate([tok[:, None], drafts], 1)
        pos_ids = (cpos[None, :, None]
                   + jnp.arange(k + 1)[None, None, :])
        pos_ids = jnp.broadcast_to(pos_ids, (3, b, k + 1))
        prev_len = cache.length
        logits, _hidden, cache, aux = self.module.apply(
            params, block, pos_ids, cache, wpos,
            method=FamilyModule.decode_block_aux)
        res = verify_draft(drafts, logits)
        a = res.accepted
        cache = cache.trim_to(prev_len[0] + 1 + a[0])
        next_tok = jnp.take_along_axis(res.next_tokens, a[:, None],
                                       axis=1)[:, 0]
        # context grows by the committed rows only: append all K+1 rows
        # (one slice write), then trim back to the accepted prefix
        ctx_len = ctx.length[0]
        ks, vs = self.module.apply(params, aux, ctx_len,
                                   method=FamilyModule.dflash_context_rows)
        for li in range(d.layers):
            ctx = ctx.append(li, ks[li], vs[li], ctx_len)
        ctx = ctx.advance(1 + a[0]).trim_to(ctx_len + 1 + a[0])
        return res.next_tokens, a, next_tok, cache, ctx

    def _generate_dflash(self, images: Sequence[np.ndarray],
                         task: Optional[str] = None, *,
                         max_new_tokens: int = 256) -> List[str]:
        """Greedy-exact DFlash speculative decoding: the emitted tokens
        come exclusively from target argmaxes (verify_draft), so output
        equals `generate` token for token; the draft only sets the pace."""
        task = task or self.cfg.tasks[0]
        d = self.cfg.dflash
        out: List[str] = []
        for image in images:
            embeds, positions, valid_lengths, max_len = self._build_inputs(
                [image], task)
            c = self.cfg.decoder
            k = d.block_size - 1
            capacity = decoder_cache_capacity(max_len,
                                              max_new_tokens + k + 1)
            cache = KVCache.create(c.layers, 1, c.kv_heads, capacity,
                                   c.head_dim, dtype=embeds.dtype)
            b, t = 1, max_len
            pad_rows = t - jnp.asarray(valid_lengths)
            cache = cache.with_pad(pad_rows)
            causal = create_causal_mask(t)
            padm = create_left_padding_mask(jnp.asarray(valid_lengths), t)
            full = jnp.broadcast_to(combine_masks(causal, padm),
                                    (b, 1, t, t))
            full = jnp.concatenate(
                [full, jnp.zeros((b, 1, t, capacity - t), bool)], -1)
            logits, _hidden, cache, aux = self._cached_jit(
                "prefill_aux", lambda: jax.jit(functools.partial(
                    self.module.apply, method=FamilyModule.prefill_aux)))(
                self.params, embeds, positions, cache, full)
            cache = cache.advance(t)

            # draft context: paged cache primed with the prompt's aux rows
            # (dflash.rs reset_context). Left-pad rows are stored but
            # masked via ctx.pad.
            n_pages_cap = max(
                1, -(-(t + max_new_tokens + k + 1) // d.page_size))
            ctx = PagedKVCache.create(d.layers, 1, d.kv_heads, n_pages_cap,
                                      d.page_size, d.head_dim,
                                      dtype=embeds.dtype)
            ctx = ctx._replace(pad=pad_rows)
            ks, vs = self._cached_jit(
                "dflash_ctx_rows", lambda: jax.jit(functools.partial(
                    self.module.apply,
                    method=FamilyModule.dflash_context_rows)))(
                self.params, aux, jnp.int32(0))
            for li in range(d.layers):
                ctx = ctx.append(li, ks[li], vs[li], jnp.int32(0))
            ctx = ctx.advance(t)

            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            cpos = jnp.max(positions, axis=(0, 2)) + 1
            wpos = t
            if not hasattr(self, "_dflash_rounds"):
                # one compiled round per page bucket (the jit-per-bucket
                # discipline of kv_cache.KV_CAPACITY_BUCKETS)
                self._dflash_rounds = {}
            ids: List[int] = [int(tok[0])]
            while len(ids) < max_new_tokens and ids[-1] != c.eos_id:
                npg = page_bucket(int(wpos) + k + 1, d.page_size,
                                  ctx.num_pages)
                spec_round = self._dflash_rounds.get(npg)
                if spec_round is None:
                    spec_round = jax.jit(functools.partial(
                        self._dflash_round_impl, n_pages=npg))
                    self._dflash_rounds[npg] = spec_round
                emitted, a, tok, cache, ctx = spec_round(
                    self.params, tok, cache, ctx, cpos, wpos)
                n_acc = int(a[0])
                for v in np.asarray(emitted)[0, : n_acc + 1].tolist():
                    ids.append(int(v))
                    if v == c.eos_id or len(ids) >= max_new_tokens:
                        break
                cpos = cpos + 1 + n_acc
                wpos = wpos + 1 + n_acc
            out.append(self._detok(ids))
        return out

    def _prepare_image(self, image: np.ndarray,
                       min_pixels: Optional[int] = None):
        import cv2

        from .processing import VisionProcessorConfig, smart_resize

        v = self.cfg.vision
        kw = {}
        if min_pixels is not None or self.cfg.min_pixels is not None:
            kw["min_pixels"] = (min_pixels if min_pixels is not None
                                else self.cfg.min_pixels)
        if self.cfg.max_pixels is not None:
            kw["max_pixels"] = self.cfg.max_pixels
        pcfg = VisionProcessorConfig(patch_size=v.patch, merge_size=v.merge,
                                     **kw)
        h, w = image.shape[:2]
        if self.cfg.img_max_tokens is not None:
            # HunyuanOCR V1: token-capped resize + max-image clamp
            # (hunyuanocr/processing.rs:97-108)
            from .processing import (clamp_to_max_image_size,
                                     smart_resize_token_limited)

            th, tw = smart_resize_token_limited(h, w, pcfg,
                                                self.cfg.img_max_tokens)
            if self.cfg.max_image_size is not None:
                th, tw = clamp_to_max_image_size(th, tw, pcfg.factor,
                                                 self.cfg.max_image_size)
        else:
            th, tw = smart_resize(h, w, pcfg)
        resized = cv2.resize(image, (tw, th), interpolation=cv2.INTER_LINEAR)
        x = (resized.astype(np.float32) / 255.0 - 0.5) / 0.5
        p, m = v.patch, v.merge
        gh, gw = th // p, tw // p
        if m > 1:
            x = x.reshape(gh // m, m, p, gw // m, m, p, 3)
            x = x.transpose(0, 3, 1, 4, 2, 5, 6)
        else:
            x = x.reshape(gh, p, gw, p, 3).transpose(0, 2, 1, 3, 4)
        return x.reshape(gh * gw, p * p * 3), (gh, gw)

    def _prompt_for(self, task: str) -> str:
        if self.cfg.prompt_templates and task in self.cfg.prompt_templates:
            return self.cfg.prompt_templates[task]
        return f"{task}:"

    def generate(self, images: Sequence[np.ndarray], task: Optional[str] = None,
                 *, max_new_tokens: int = 256,
                 prompt: Optional[str] = None) -> List[str]:
        """``prompt`` overrides the task's template verbatim — the
        generate_with_prompts / per-backend prompt path of the reference
        (doc_parser.rs RecognitionBackend impls)."""
        task = task or self.cfg.tasks[0]
        if task not in self.cfg.tasks:
            raise InvalidInputError("unknown task for family",
                                    family=self.cfg.name, task=task,
                                    known=list(self.cfg.tasks))
        if not images:
            return []
        embeds, positions, valid_lengths, max_len = self._build_inputs(
            images, task, prompt=prompt)
        capacity = decoder_cache_capacity(max_len, max_new_tokens)
        with stage_timer(f"vl[{self.cfg.name}].generate",
                         batch=len(images), prompt=max_len):
            ids = np.asarray(self._gen(
                self.params, embeds, positions,
                jnp.asarray(valid_lengths),
                max_new=max_new_tokens, capacity=capacity))
        return [self._detok(row) for row in ids]

    def _detok(self, row) -> str:
        row = list(map(int, row))
        if self.cfg.decoder.eos_id in row:
            row = row[: row.index(self.cfg.decoder.eos_id)]
        return self.tokenizer.decode(row)

    def _build_inputs(self, images, task, prompt: Optional[str] = None):
        m2 = self.cfg.vision.merge ** 2
        task_min = (self.cfg.task_min_pixels or {}).get(task)
        prepared = [self._prepare_image(im, min_pixels=task_min)
                    for im in images]
        max_t = max(p.shape[0] for p, _ in prepared)
        max_t = ((max_t + m2 - 1) // m2) * m2
        b = len(images)
        pd = self.cfg.vision.patch ** 2 * 3
        batch = np.zeros((b, max_t, pd), np.float32)
        valid = np.zeros((b, max_t), bool)
        for i, (p, _) in enumerate(prepared):
            batch[i, : p.shape[0]] = p
            valid[i, : p.shape[0]] = True
        img_embeds = self._encode_vision(
            self.params, jnp.asarray(batch, self.runtime.compute_dtype),
            jnp.asarray(valid))                 # stays on device

        instruction = prompt if prompt is not None \
            else self._prompt_for(task)
        rows = []
        for i, (p, (gh, gw)) in enumerate(prepared):
            n_tok = p.shape[0] // m2
            rows.append(self.tokenizer.encode("User: ")
                        + [self.IMAGE_START_ID]
                        + [self.IMAGE_PAD_ID] * n_tok
                        + [self.IMAGE_END_ID]
                        + self.tokenizer.encode(
                            f"{instruction}\nAssistant: "))
        max_len = max(len(r) for r in rows)
        ids = np.zeros((b, max_len), np.int32)
        valid_lengths = np.zeros((b,), np.int32)
        positions = np.zeros((3, b, max_len), np.int32)
        spans = []
        from .model import _mrope_positions

        for i, row in enumerate(rows):
            off = max_len - len(row)
            ids[i, off:] = row
            valid_lengths[i] = len(row)
            gh, gw = prepared[i][1]
            m = self.cfg.vision.merge
            positions[:, i, :], span = _mrope_positions(
                row, off, max_len, (gh // m, gw // m), self.IMAGE_PAD_ID)
            spans.append(span)
        embeds = self._fuse(
            self.params, jnp.asarray(ids), img_embeds,
            jnp.asarray(np.array([s for s, _ in spans], np.int32)),
            jnp.asarray(np.array([n for _, n in spans], np.int32)))
        return (embeds.astype(self.runtime.compute_dtype),
                jnp.asarray(positions), valid_lengths, max_len)


# ----------------------- mechanism-bearing families -----------------------

class HunyuanOCR(VLMFamily):
    """XDRoPE decoder; DFlash-style block speculation is exposed through
    `generate_speculative` using a draft callable (the trained DFlash
    draft net plugs in at weight-conversion time; see vl/speculative.py
    for the verify/rollback core and its tests)."""

    def __init__(self, params=None, *, tiny: bool = False, **kw):
        cfg = FAMILY_CONFIGS["hunyuanocr"]
        super().__init__(cfg.tiny() if tiny else cfg, params, **kw)


class GLMOCR(VLMFamily):
    """MRoPE decoder + MTP recurrent-draft speculation
    (vl/speculative.recurrent_draft + verify_draft)."""

    def __init__(self, params=None, *, tiny: bool = False, **kw):
        cfg = FAMILY_CONFIGS["glmocr"]
        super().__init__(cfg.tiny() if tiny else cfg, params, **kw)


class MinerU(VLMFamily):
    """Qwen2-VL-style backbone; model-native two-step layout→extraction
    (mineru/model.rs): step 1 asks for layout JSON, step 2 extracts each
    region with a focused prompt."""

    def __init__(self, params=None, *, tiny: bool = False, **kw):
        cfg = FAMILY_CONFIGS["mineru"]
        super().__init__(cfg.tiny() if tiny else cfg, params, **kw)

    def parse_two_step(self, image: np.ndarray, *,
                       max_new_tokens: int = 256):
        """Model-native two-step layout→extraction
        (examples/mineru.rs:155-230 via vl/mineru_layout.py): layout
        detection on the 1036² square resize, `<|box_start|>…` line
        parsing, per-block crop + de-rotation + per-type prompts, table
        OTSL→HTML. Returns the typed ``ContentBlock`` list."""
        from .mineru_layout import run_two_step

        return run_two_step(self, image, max_new_tokens=max_new_tokens)


class MinerUDiffusion(VLMFamily):
    """SDAR block-diffusion decoder (mineru_diffusion/model.rs:1-12):
    each L-token block is predicted in parallel (bidirectional within the
    block, causal to the committed prefix), iteratively unmasked by
    confidence (vl/diffusion.py), then committed to the KV cache in one
    causal pass. `generate` runs this loop instead of the AR scan."""

    MASK_TOKEN_OFFSET = 1   # vocab_size-1 is the mask embedding id

    def __init__(self, params=None, *, tiny: bool = False, **kw):
        cfg = FAMILY_CONFIGS["mineru_diffusion"]
        super().__init__(cfg.tiny() if tiny else cfg, params, **kw)
        self._bidir = jax.jit(functools.partial(
            self.module.apply, method=FamilyModule.decode_block_bidir))
        self._commit = jax.jit(functools.partial(
            self.module.apply, method=FamilyModule.decode_block))
        self._prefill_j = jax.jit(functools.partial(
            self.module.apply, method=FamilyModule.prefill))

    def generate(self, images, task=None, *, max_new_tokens: int = 256,
                 num_unmask_steps: int = 4,
                 confidence_threshold: float = 0.9,
                 prompt: Optional[str] = None) -> List[str]:
        from .diffusion import MASK_ID, transfer_count, unmask_step

        task = task or self.cfg.tasks[0]
        c = self.cfg.decoder
        L = self.cfg.diffusion_block
        mask_tok = c.vocab_size - self.MASK_TOKEN_OFFSET
        out: List[str] = []
        for image in images:
            embeds, positions, valid_lengths, max_len = self._build_inputs(
                [image], task, prompt=prompt)
            n_blocks = max(1, -(-max_new_tokens // L))
            capacity = decoder_cache_capacity(max_len, n_blocks * L + L)
            cache = KVCache.create(c.layers, 1, c.kv_heads, capacity,
                                   c.head_dim, dtype=embeds.dtype)
            t = max_len
            cache = cache.with_pad(t - jnp.asarray(valid_lengths))
            causal = create_causal_mask(t)
            pad = create_left_padding_mask(jnp.asarray(valid_lengths), t)
            full = jnp.broadcast_to(combine_masks(causal, pad), (1, 1, t, t))
            full = jnp.concatenate(
                [full, jnp.zeros((1, 1, t, capacity - t), bool)], -1)
            _, _, cache, _ds = self._prefill_j(
                self.params, embeds, positions, cache, full)
            cache = cache.advance(t)
            cpos = int(np.asarray(jnp.max(positions)) ) + 1
            wpos = t

            ids: List[int] = []
            done = False
            for _ in range(n_blocks):
                if done:
                    break
                tokens = np.full((1, L), MASK_ID, np.int64)
                pos_ids = np.broadcast_to(
                    (cpos + np.arange(L))[None, None, :], (3, 1, L)
                ).astype(np.int32)
                for s in range(num_unmask_steps):
                    if not (tokens == MASK_ID).any():
                        break
                    feed = np.where(tokens == MASK_ID, mask_tok, tokens)
                    logits, _, _trial_cache = self._bidir(
                        self.params, jnp.asarray(feed, jnp.int32),
                        jnp.asarray(pos_ids), cache, wpos)
                    prev = transfer_count(s - 1, num_unmask_steps, L) if s else 0
                    tokens = np.asarray(unmask_step(
                        jnp.asarray(tokens.astype(np.int32)), logits,
                        confidence_threshold=confidence_threshold,
                        min_transfer=transfer_count(
                            s, num_unmask_steps, L) - prev)).astype(np.int64)
                # commit the finished block causally (block KV commit)
                _, _, cache = self._commit(
                    self.params, jnp.asarray(tokens.astype(np.int32)),
                    jnp.asarray(pos_ids), cache, wpos)
                for v in tokens[0].tolist():
                    if v == c.eos_id:
                        done = True
                        break
                    ids.append(int(v))
                cpos += L
                wpos += L
            out.append(self._detok(ids + [c.eos_id]))
        return out


class HPDParsing(VLMFamily):
    """Parent/child fork decoding: the parent pass emits ``<FORK>``
    markers; each marker spawns a child branch continued from the
    PARENT's KV through its fork position (per-row lengths over one
    replicated row — the fork_at view of hpd_parsing/model.rs:502),
    advanced as one continuous batch. The full mid-decode admission
    scheduler + per-branch P-MTP lives on the exact stack
    (vl/hpd_scheduler.py via exact_models.HpdForkExact); this harness
    keeps the simpler two-wave shape for DocParser integration."""

    def __init__(self, params=None, *, tiny: bool = False, **kw):
        cfg = FAMILY_CONFIGS["hpd_parsing"]
        super().__init__(cfg.tiny() if tiny else cfg, params, **kw)

    def parse_with_forks(self, image: np.ndarray, *,
                         max_new_tokens: int = 128,
                         max_children: Optional[int] = None) -> Dict:
        """Parent pass, then children continued from the SHARED prompt
        prefix KV: the prefill cache's batch row is replicated via
        `KVCache.keep_indices` — zero recompute of the prefix — and all
        children advance as one continuous batch (the zero-copy
        shared-prefix design of mineru_diffusion/text.rs:42-113 applied
        per hpd_parsing/model.rs:27-41)."""

        c = self.cfg.decoder
        embeds, positions, valid_lengths, max_len = self._build_inputs(
            [image], "parse")
        capacity = decoder_cache_capacity(max_len, max_new_tokens + 1)
        cache = KVCache.create(c.layers, 1, c.kv_heads, capacity,
                               c.head_dim, dtype=embeds.dtype)
        t = max_len
        cache = cache.with_pad(t - jnp.asarray(valid_lengths))
        causal = create_causal_mask(t)
        pad = create_left_padding_mask(jnp.asarray(valid_lengths), t)
        full = jnp.broadcast_to(combine_masks(causal, pad), (1, 1, t, t))
        full = jnp.concatenate(
            [full, jnp.zeros((1, 1, t, capacity - t), bool)], -1)
        prefill = self._cached_jit(
            "prefill", lambda: jax.jit(functools.partial(
                self.module.apply, method=FamilyModule.prefill)))
        logits, _, cache, _ds = prefill(self.params, embeds, positions,
                                        cache, full)
        prefix_cache = cache.advance(t)
        first = jnp.argmax(logits, -1).astype(jnp.int32)
        npos = jnp.max(jnp.asarray(positions)) + 1

        parent_ids, parent_cache = self._decode_from_cache(
            first, prefix_cache, npos, t, max_new_tokens)
        parent = self._detok(parent_ids[0].tolist())

        fork_ids = self.tokenizer.encode(self.cfg.fork_token)
        forks = _fork_points(parent_ids[0].tolist(), fork_ids)
        forks = forks[: max_children or self.cfg.max_active_branches]

        children: List[str] = []
        if forks:
            n = len(forks)
            # children continue from the PARENT's KV through each fork
            # position (SdarKvCache fork_at views, hpd_parsing/
            # model.rs:502 + mineru_diffusion/text.rs:42-113): replicate
            # the parent's post-decode row and set per-row lengths to
            # prompt + marker end, so each child attends the parent's
            # generated context preceding its fork marker.
            seeds = [tok for _, tok in forks]
            ends = [end for end, _ in forks]
            child_cache = parent_cache.keep_indices(
                jnp.zeros((n,), jnp.int32))
            child_cache = child_cache.with_lengths(
                jnp.asarray([t + e for e in ends], jnp.int32))
            child_ids, _ = self._decode_from_cache(
                jnp.asarray(seeds, jnp.int32), child_cache,
                jnp.asarray([int(npos) + e for e in ends], jnp.int32),
                jnp.asarray([t + e for e in ends], jnp.int32),
                max_new_tokens)
            children = [self._detok(row.tolist()) for row in child_ids]
        # runtime stats mirror HpdRuntimeStats (hpd_parsing/model.rs:71)
        return {"parent": parent, "children": children,
                "stats": {"prefix_len": int(t),
                          "parent_tokens": sum(
                              1 for i in parent_ids[0].tolist()
                              if i != c.eos_id),
                          "num_children": len(children),
                          "child_tokens": sum(
                              sum(1 for i in row.tolist() if i != c.eos_id)
                              for row in child_ids) if forks else 0}}

    def _decode_from_cache(self, first_tok, cache, npos, wpos, max_new):
        """Greedy scan decode continuing from an existing cache (B rows).
        ``npos``/``wpos`` may be scalars or per-row (B,) vectors (children
        forked at different parent depths sit at different positions).
        Returns (ids (B, max_new), final cache)."""
        if not hasattr(self, "_decode_from_cache_jit"):
            c = self.cfg.decoder

            def run(params, first, cache, npos, wpos, *, max_new):
                b = first.shape[0]
                dstate0 = _empty_dstate(self.cfg, b)
                npos_v = (npos if npos.ndim else
                          jnp.full((b,), npos, jnp.int32))

                def step(carry, i):
                    tok, cache, done, np_, ds = carry
                    pos_ids = jnp.broadcast_to(np_[None, :, None],
                                               (3, b, 1))
                    logits, _, cache, ds = self.module.apply(
                        params, tok, pos_ids, cache, wpos + i, ds,
                        method=FamilyModule.decode_step)
                    nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                    nxt = jnp.where(done, c.eos_id, nxt)
                    done = done | (nxt == c.eos_id)
                    return (nxt, cache, done, np_ + 1, ds), tok

                (_, cache, _, _, _), ids = jax.lax.scan(
                    step, (first, cache, first == c.eos_id, npos_v,
                           dstate0),
                    jnp.arange(max_new), length=max_new)
                return jnp.transpose(ids, (1, 0)), cache

            self._decode_from_cache_jit = jax.jit(
                run, static_argnames=("max_new",))
        ids, cache = self._decode_from_cache_jit(
            self.params, first_tok, cache, jnp.asarray(npos),
            jnp.asarray(wpos), max_new=max_new)
        return np.asarray(ids), cache


def filter_visual_image_tags(text: str) -> str:
    """Drop standalone visual-region ``<img src="images/bbox_…">`` blocks
    (ovisocr2/model.rs:546 filter_visual_image_tags)."""
    return "\n\n".join(
        block for block in text.split("\n\n")
        if not block.strip().startswith('<img src="images/bbox_'))


def clean_truncated_repeats(text: str) -> str:
    """Official OvisOCR2 truncated-repeat cleanup
    (ovisocr2/model.rs:553-586): for long outputs (≥8000 chars), find the
    shortest period ≤200 whose repetition covers ≥100 chars ≥5 times at
    the tail, and collapse it to one period (+ the partial tail)."""
    MIN_TEXT_LEN, MAX_PERIOD = 8000, 200
    MIN_REPEAT_CHARS, MIN_REPEAT_TIMES = 100, 5
    n = len(text)
    if n < MIN_TEXT_LEN:
        return text
    for unit in range(1, min(MAX_PERIOD, n - 1) + 1):
        if text[n - 1] != text[n - 1 - unit]:
            continue
        match_len = 1
        i = n - 2
        while i >= unit and text[i] == text[i - unit]:
            match_len += 1
            i -= 1
        total = match_len + unit
        times = total // unit
        tail = total % unit
        if times >= MIN_REPEAT_TIMES and total >= MIN_REPEAT_CHARS:
            prefix_end = n - total + unit
            return text[:prefix_end] + (text[n - tail:] if tail else "")
    return text


class OvisOCR2(VLMFamily):
    """Hybrid gated-delta/full-attention decoder (3:1 pattern); whole-page
    → markdown with the official prompt, 448²..2880² pixel bounds, and
    default post-processing (docs/usage.md:397-410)."""

    def __init__(self, params=None, *, tiny: bool = False, **kw):
        cfg = FAMILY_CONFIGS["ovisocr2"]
        super().__init__(cfg.tiny() if tiny else cfg, params, **kw)

    def parse(self, images: Sequence[np.ndarray], *,
              max_new_tokens: int = 16384,
              keep_image_tags: bool = False) -> List[str]:
        """Page(s) → Markdown with the official default post-processing:
        truncated-repeat cleanup + standalone image-tag removal
        (OvisOcr2::parse / parse_with_image_tags; the 16384 default is
        DEFAULT_MAX_NEW_TOKENS)."""
        outs = self.generate(images, "markdown",
                             max_new_tokens=max_new_tokens)
        cleaned = [clean_truncated_repeats(t) for t in outs]
        if keep_image_tags:
            return cleaned
        return [filter_visual_image_tags(t) for t in cleaned]


class MonkeyOCRv2(VLMFamily):
    """Task-prompted parsing; table output is OTSL (vl/otsl.py converts);
    the EndToEnd task emits a normalized-bbox JSON list
    (monkeyocrv2 docs/usage.md:484) parsed by `parse_end2end`."""

    def __init__(self, params=None, *, tiny: bool = False, **kw):
        cfg = FAMILY_CONFIGS["monkeyocrv2"]
        super().__init__(cfg.tiny() if tiny else cfg, params, **kw)

    def parse_end2end(self, image: np.ndarray, *,
                      max_new_tokens: int = 1024):
        """EndToEnd task → StructureResult via the JSON-list output."""
        text = self.generate([image], "end2end",
                             max_new_tokens=max_new_tokens)[0]
        h, w = image.shape[:2]
        return monkey_end2end_to_structure(text, w, h)


def monkey_end2end_to_structure(text: str, page_w: int, page_h: int):
    """Parse MonkeyOCR's EndToEnd output — a JSON list of
    {"bbox": [x0, y0, x1, y1] (normalized 0-1 or 0-1000), "category":
    label, "text"/"content": str} — into a StructureResult. Tolerant of
    trailing junk (truncated generations)."""

    import json
    import re

    from ..domain.structure import (LayoutElement, LayoutElementType,
                                    StructureResult)

    items = []
    m = re.search(r"\[.*\]", text, re.DOTALL)
    if m:
        try:
            parsed = json.loads(m.group(0))
            items = [x for x in parsed if isinstance(x, dict)]
        except json.JSONDecodeError:
            items = []
    if not items:
        # salvage complete objects from truncated/malformed output
        for o in re.findall(r"\{[^{}]*\}", text):
            try:
                obj = json.loads(o)
                if isinstance(obj, dict):
                    items.append(obj)
            except json.JSONDecodeError:
                continue
    elements = []
    for item in items:
        if not isinstance(item, dict):
            continue
        bbox = item.get("bbox") or item.get("box")
        if not bbox or len(bbox) < 4:
            continue
        b = [float(v) for v in bbox[:4]]
        scale = 1.0
        if max(b) <= 1.5:
            scale_x, scale_y = page_w, page_h
        elif max(b) <= 1000.0:
            scale_x, scale_y = page_w / 1000.0, page_h / 1000.0
        else:
            scale_x = scale_y = 1.0
        box = np.array([b[0] * scale_x, b[1] * scale_y,
                        b[2] * scale_x, b[3] * scale_y], np.float32)
        elements.append(LayoutElement(
            element_type=LayoutElementType.from_label(
                str(item.get("category", item.get("type", "text")))),
            box=box, score=float(item.get("score", 1.0)),
            text=item.get("text") or item.get("content")))
    return StructureResult(elements=elements, width=page_w, height=page_h)


def _fork_points(ids: List[int], pattern: List[int]
                 ) -> List[Tuple[int, int]]:
    """(marker-end index, seed token) for each ``pattern`` occurrence
    followed by a token — the fork boundary within the parent stream."""
    out: List[Tuple[int, int]] = []
    if not pattern:
        return out
    n, m = len(ids), len(pattern)
    i = 0
    while i <= n - m:
        if ids[i : i + m] == pattern:
            if i + m < n:
                out.append((i + m, ids[i + m]))
            i += m
        else:
            i += 1
    return out


FAMILY_CLASSES = {
    "hunyuanocr": HunyuanOCR,
    "glmocr": GLMOCR,
    "mineru": MinerU,
    "mineru_diffusion": MinerUDiffusion,
    "hpd_parsing": HPDParsing,
    "ovisocr2": OvisOCR2,
    "monkeyocrv2": MonkeyOCRv2,
}

"""End-to-end exact VLM drivers: MinerU, GLM-OCR, OvisOCR2, HPD, Monkey.

Ties each family's EXACT vision tower (vl/vision_towers.py) to its EXACT
text decoder (vl/llm_decoders.py) under the checkpoint's own tree roots,
with a shared batch-1 prefill + lax.scan greedy harness — so every family
`generate()` runs the architecture its published weights expect:

| family          | vision root        | text root                  |
|-----------------|--------------------|----------------------------|
| MinerU 2.5      | ``visual.``        | ``model.`` + ``lm_head``   | (mineru/model.rs:208-242)
| GLM-OCR         | ``model.visual.``  | ``model.language_model.`` + ``lm_head`` | (glmocr/model.rs:71-95)
| OvisOCR2        | ``model.visual.``  | ``model.language_model.`` + ``lm_head`` | (ovisocr2/model.rs:77-78)
| HPD-Parsing     | ``vision_model.``/``mlp1.`` | ``language_model.model.`` + ``language_model.lm_head`` | (hpd_parsing/model.rs:245-247)
| MonkeyOCRv2     | ``vision_tower.``  | ``model.`` + ``lm_head``   | (monkeyocrv2/model.rs:94-95)

Image-token positions: MinerU/Monkey use the Qwen2-VL 3-axis MRoPE rule
(text axes run together; an image span takes (t, row, col) grid ids from
a common base, and following text resumes at max+1 — mineru/model.rs
position builder); the rope/qk-norm decoders (SDAR/GLM/Ovis) use plain
sequential positions.

These drivers run tiny configs today (random weights); the full-size
configs are the published-checkpoint presets in llm_decoders.py.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .attention import (combine_masks, create_causal_mask,
                        create_generation_mask,
                        create_left_padding_mask)
from .kv_cache import KVCache, decoder_cache_capacity
from .llm_decoders import (GLM_TEXT, MINERU_TEXT, OVIS_TEXT, SDAR_TEXT,
                           UnifiedDecoder, UnifiedLMConfig)
from .vision_towers import (GlmVisionConfig, GlmVisionModel,
                            HpdVisionConfig, HpdVisionModel,
                            MinerUVisionConfig, MinerUVisionModel,
                            MonkeyVisionConfig, MonkeyVisionModel,
                            OvisVisionConfig, OvisVisionModel,
                            _qwen_vision_rope, intern_tile_image,
                            mineru_vision_positions)


@dataclass(frozen=True)
class ExactVLMSpec:
    """One family's wiring: tower kind + tree roots + position rule."""

    name: str
    text_cfg: UnifiedLMConfig
    tower: str                       # qwen2vl | glm | ovis | internvit
    vision_root: str
    text_root: str
    lm_head_name: str
    image_token_id: int = 151655
    mrope_images: bool = False       # Qwen2-VL 3-axis image positions


def _tiny_text(cfg: UnifiedLMConfig, **kw) -> UnifiedLMConfig:
    base = dict(vocab_size=256, hidden=48, layers=2, heads=4, kv_heads=2,
                head_dim=12, ffn=96)
    base.update(kw)
    return dataclasses.replace(cfg, **base)


class ExactVLMModule(nn.Module):
    """Vision tower + UnifiedDecoder + LM head in one param tree, with
    submodule names equal to the checkpoint roots."""

    spec: ExactVLMSpec
    vision_cfg: object

    def setup(self):
        s = self.spec
        tower_cls = {"qwen2vl": MinerUVisionModel, "glm": GlmVisionModel,
                     "ovis": OvisVisionModel, "monkey": MonkeyVisionModel,
                     "internvit": HpdVisionModel}[s.tower]
        self.visual = tower_cls(self.vision_cfg, name=s.vision_root)
        self.text = UnifiedDecoder(s.text_cfg, name=s.text_root)
        self.lm_head = nn.Dense(s.text_cfg.vocab_size, use_bias=False,
                                name=s.lm_head_name)

    def encode_image(self, *tower_args):
        return self.visual(*tower_args)

    def embed(self, ids):
        return self.text.embed(ids)

    def lm_logits(self, hidden):
        """Project hidden states through the target LM head (the MTP
        draft reuses it — hpd_parsing/model.rs:631-636)."""
        return self.lm_head(hidden).astype(jnp.float32)

    def prefill(self, embeds, position_ids, cache, mask, dstate,
                conv_state, pad_mask=None):
        hidden, cache, dstate, conv_state = self.text(
            embeds, position_ids, cache, jnp.int32(0), mask, dstate,
            conv_state, pad_mask=pad_mask)
        logits = self.lm_head(hidden[:, -1]).astype(jnp.float32)
        return logits, cache, dstate, conv_state

    def prefill_hidden(self, embeds, position_ids, cache, mask, dstate,
                       conv_state):
        """Prefill that also returns the last hidden state — the P-MTP
        producer for the first scheduler round (start_branch,
        hpd_parsing/model.rs:438-465)."""
        hidden, cache, dstate, conv_state = self.text(
            embeds, position_ids, cache, jnp.int32(0), mask, dstate,
            conv_state)
        last = hidden[:, -1]
        logits = self.lm_head(last).astype(jnp.float32)
        return logits, last, cache, dstate, conv_state

    def prefill_hidden_all(self, embeds, position_ids, cache, mask,
                           dstate, conv_state):
        """Prefill that returns ALL hidden states — the GLM-MTP draft
        prefill consumes (embeds[j+1], hidden[j]) pairs over the whole
        prompt (glmocr/mtp.rs prefill stream)."""
        hidden, cache, dstate, conv_state = self.text(
            embeds, position_ids, cache, jnp.int32(0), mask, dstate,
            conv_state)
        logits = self.lm_head(hidden[:, -1]).astype(jnp.float32)
        return logits, hidden, cache, dstate, conv_state

    def decode_step(self, tok_ids, position_ids, cache, pos, dstate,
                    conv_state):
        embeds = self.text.embed(tok_ids)[:, None, :]
        mask = create_generation_mask(cache.length + 1, cache.capacity,
                                      cache.pad)
        hidden, cache, dstate, conv_state = self.text(
            embeds, position_ids, cache, pos, mask, dstate, conv_state)
        cache = cache.advance(1)
        logits = self.lm_head(hidden[:, -1]).astype(jnp.float32)
        return logits, cache, dstate, conv_state

    def _block_mask(self, cache, t: int, bidirectional: bool):
        cap = cache.capacity
        cap_pos = jnp.arange(cap)[None, None, None, :]
        if bidirectional:
            limit = cache.length[:, None, None, None] + t
            mask = jnp.broadcast_to(cap_pos < limit,
                                    (cache.length.shape[0], 1, t, cap))
        else:
            q_pos = jnp.arange(t)[None, None, :, None]
            limit = cache.length[:, None, None, None] + q_pos + 1
            mask = cap_pos < limit
        if cache.pad is not None:
            mask = mask & (cap_pos >= cache.pad[:, None, None, None])
        return mask

    def decode_block_bidir(self, tok_ids, position_ids, cache, pos,
                           dstate, conv_state):
        """Non-causal block pass (SDAR diffusion trials — callers discard
        the returned cache except on the commit pass)."""
        b, t = tok_ids.shape
        embeds = self.text.embed(tok_ids)
        mask = self._block_mask(cache, t, True)
        hidden, cache, dstate, conv_state = self.text(
            embeds, position_ids, cache, pos, mask, dstate, conv_state)
        cache = cache.advance(t)
        logits = self.lm_head(hidden).astype(jnp.float32)
        return logits, cache, dstate, conv_state

    def decode_block_hidden(self, tok_ids, position_ids, cache, pos,
                            dstate, conv_state):
        """Causal block pass that also returns the hidden states, with
        per-row ``pos`` support (continuous-batch speculative verify,
        hpd_parsing/model.rs:568-703 forward_causal_batch). The cache
        comes back UN-advanced: the scheduler sets per-row lengths from
        per-branch acceptance counts."""
        b, t = tok_ids.shape
        embeds = self.text.embed(tok_ids)
        mask = self._block_mask(cache, t, False)
        hidden, cache, dstate, conv_state = self.text(
            embeds, position_ids, cache, pos, mask, dstate, conv_state)
        logits = self.lm_head(hidden).astype(jnp.float32)
        return logits, hidden, cache, dstate, conv_state

    def decode_block_causal(self, tok_ids, position_ids, cache, pos,
                            dstate, conv_state):
        """Causal block pass (diffusion KV commit / speculative verify)."""
        b, t = tok_ids.shape
        embeds = self.text.embed(tok_ids)
        mask = self._block_mask(cache, t, False)
        hidden, cache, dstate, conv_state = self.text(
            embeds, position_ids, cache, pos, mask, dstate, conv_state)
        cache = cache.advance(t)
        logits = self.lm_head(hidden).astype(jnp.float32)
        return logits, cache, dstate, conv_state

    def decode_block_hidden(self, tok_ids, position_ids, cache, pos,
                            dstate, conv_state):
        """:meth:`decode_block_causal` that also returns the hidden
        states (B, T, H) — the MTP verify round reads the target hidden
        at the last accepted position as the next draft's prev-hidden
        (glmocr/mtp.rs: the draft consumes TARGET hiddens)."""
        b, t = tok_ids.shape
        embeds = self.text.embed(tok_ids)
        mask = self._block_mask(cache, t, False)
        hidden, cache, dstate, conv_state = self.text(
            embeds, position_ids, cache, pos, mask, dstate, conv_state)
        cache = cache.advance(t)
        logits = self.lm_head(hidden).astype(jnp.float32)
        return logits, hidden, cache, dstate, conv_state

    def decode_block_spec(self, tok_ids, position_ids, cache, pos,
                          dstate, conv_state):
        """Causal verify block that returns PER-STEP recurrent states
        (Ld, B, T, …) from the linear-attention layers only (rows ordered
        by cfg.delta_layers()), so the caller can resume decoding from the
        last accepted draft position — the delta-layer analog of the KV
        cache's trim_to rollback (the combination the reference avoids;
        vl/speculative.py docstring). Full-attention layers' states pass
        through the block unchanged and are NOT duplicated over T.
        The cache comes back advanced by T; trim after verification."""
        b, t = tok_ids.shape
        embeds = self.text.embed(tok_ids)
        mask = self._block_mask(cache, t, False)
        hidden, cache, step_ds, step_cs = self.text(
            embeds, position_ids, cache, pos, mask, dstate, conv_state,
            True)
        cache = cache.advance(t)
        logits = self.lm_head(hidden).astype(jnp.float32)
        return logits, cache, step_ds, step_cs

    def init_all(self, tower_args, ids, position_ids):
        img = self.encode_image(*tower_args)
        emb = self.text.embed(ids)
        c = self.spec.text_cfg
        b, t = ids.shape
        cache = KVCache.create(c.layers, b, c.kv_heads, t, c.head_dim,
                               dtype=emb.dtype)
        dstate, conv = self.text.empty_states(b)
        mask = jnp.ones((b, 1, t, t), bool)
        logits, *_ = self.prefill(emb, position_ids, cache, mask, dstate,
                                  conv)
        return img, logits


def qwen2vl_positions(seq_len: int, image_start: int, n_image: int,
                      grid_hw: Tuple[int, int], merge: int) -> np.ndarray:
    """Qwen2-VL get_rope_index for one image: 3 axes (t, h, w); text runs
    all axes together; the image span uses grid coordinates from the text
    base; following text resumes at max+1."""
    hm, wm = grid_hw[0] // merge, grid_hw[1] // merge
    pos = np.zeros((3, seq_len), np.int32)
    pos[:, :image_start] = np.arange(image_start)
    base = image_start
    j = np.arange(n_image)
    pos[0, image_start:image_start + n_image] = base
    pos[1, image_start:image_start + n_image] = base + j // wm
    pos[2, image_start:image_start + n_image] = base + j % wm
    nxt = int(pos[:, image_start:image_start + n_image].max()) + 1 \
        if n_image else base
    tail = seq_len - image_start - n_image
    pos[:, image_start + n_image:] = nxt + np.arange(tail)
    return pos


class ExactVLM:
    """Shared batch-1 prefill + scan greedy harness over ExactVLMModule."""

    def __init__(self, spec: ExactVLMSpec, vision_cfg, params=None, *,
                 tokenizer=None, runtime=None, seed: int = 0,
                 fast_init: bool = False):
        from ..runtime.runtime import Runtime
        from .model import ByteTokenizer

        self.spec = spec
        self.vision_cfg = vision_cfg
        self.runtime = runtime or Runtime.default()
        self.tokenizer = tokenizer or ByteTokenizer()
        self.module = ExactVLMModule(spec, vision_cfg)
        if params is None:
            # fast_init: shape-only eval + host randoms — lets FULL-SIZE
            # configs construct without flax's eager init (which would
            # dispatch per-layer programs through the remote-compile
            # tunnel); used by tools/vl_bench.py
            params = self._init_params(seed, fast=fast_init)
        self.params = self.runtime.put_params_vl(params)
        self._gen = jax.jit(self._prefill_decode,
                            static_argnames=("max_new", "capacity"))
        self._encode = jax.jit(lambda p, *a: self.module.apply(
            p, *a, method=ExactVLMModule.encode_image))
        # per-instance cache of jitted callables: building a FRESH jax.jit
        # wrapper inside generate() would discard the trace cache every
        # call (each wrapper retraces + re-lowers — expensive through the
        # remote-compile tunnel) and defeat microbench warmup
        self._jits: dict = {}

    def _cached_jit(self, key, factory):
        """Return a jitted callable cached on ``key`` (build via
        ``factory`` on first use). Keys must capture every static that
        changes the trace (e.g. draft_k, ngram)."""
        fn = self._jits.get(key)
        if fn is None:
            fn = self._jits[key] = factory()
        return fn

    # -------------------- tower preprocessing --------------------
    def _tower_inputs(self, image: np.ndarray):
        import cv2

        s, v = self.spec, self.vision_cfg
        if s.tower == "internvit":
            tiles = intern_tile_image(image, image_size=v.image_size,
                                      max_blocks=4)
            p = v.patch
            g = v.grid
            arr = np.stack(tiles).astype(np.float32) / 255.0
            arr = (arr - 0.5) / 0.5
            n = arr.shape[0]
            patches = arr.reshape(n, g, p, g, p, 3).transpose(
                0, 1, 3, 2, 4, 5).reshape(n, g * g, 3 * p * p)
            return (jnp.asarray(patches),), len(tiles) * (g // v.downsample) ** 2
        # qwen-style towers: resize to patch·merge multiples, merge-block
        # patch order + 2-D rope tables
        unit = v.patch * v.merge
        h, w = image.shape[:2]
        th = max(unit, int(round(h / unit)) * unit)
        tw = max(unit, int(round(w / unit)) * unit)
        resized = cv2.resize(image, (tw, th),
                             interpolation=cv2.INTER_LINEAR)
        x = (resized.astype(np.float32) / 255.0 - 0.5) / 0.5
        p = v.patch
        gh, gw = th // p, tw // p
        m = v.merge
        x = x.reshape(gh // m, m, p, gw // m, m, p, 3)
        x = x.transpose(0, 3, 1, 4, 2, 5, 6).reshape(gh * gw, p * p * 3)
        pd = x.shape[-1]
        if s.tower == "qwen2vl":
            tp = getattr(v, "temporal_patch", 1)
            x = np.tile(x, (1, tp))           # temporal duplication
        hp, wp = mineru_vision_positions(gh, gw, m)
        cos, sin = _qwen_vision_rope(hp, wp, v.head_dim, v.rope_theta)
        self._last_grid = (gh, gw)
        if s.tower == "ovis":
            # interpolated pos rows in the same merge-block order
            pos_rows = self._ovis_pos_rows(gh, gw)
            return ((jnp.asarray(x), jnp.asarray(pos_rows),
                     jnp.asarray(cos), jnp.asarray(sin)),
                    (gh // m) * (gw // m))
        return ((jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)),
                (gh // m) * (gw // m))

    def _ovis_pos_rows(self, gh: int, gw: int) -> np.ndarray:
        from .hunyuan import interpolate_positions

        v = self.vision_cfg
        table = np.asarray(self.params["params"][self.spec.vision_root]
                           ["pos_embed.weight"], np.float32)
        rows = interpolate_positions(table, v.pos_grid, gh, gw)
        m = v.merge
        rows = rows.reshape(gh // m, m, gw // m, m, -1)
        rows = rows.transpose(0, 2, 1, 3, 4).reshape(gh * gw, -1)
        return rows

    def _init_params(self, seed: int, fast: bool = False):
        s, v = self.spec, self.vision_cfg
        rng = jax.random.PRNGKey(seed)
        m = getattr(v, "merge", 2)
        p = v.patch
        if s.tower == "internvit":
            g = v.grid
            tower_args = (jnp.zeros((1, g * g, 3 * p * p), jnp.float32),)
        else:
            t = m * m
            pd = p * p * 3 * (getattr(v, "temporal_patch", 1)
                              if s.tower == "qwen2vl" else 1)
            hd = v.head_dim
            cos = jnp.ones((t, hd), jnp.float32)
            sin = jnp.zeros((t, hd), jnp.float32)
            if s.tower == "ovis":
                tower_args = (jnp.zeros((t, pd), jnp.float32),
                              jnp.zeros((t, v.hidden), jnp.float32),
                              cos, sin)
            else:
                tower_args = (jnp.zeros((t, pd), jnp.float32), cos, sin)
        ids = jnp.zeros((1, 4), jnp.int32)
        naxes = 3 if s.text_cfg.rope_kind == "mrope" else 1
        pids = (jnp.zeros((3, 1, 4), jnp.int32) if naxes == 3
                else jnp.zeros((1, 4), jnp.int32))
        if fast:
            from ..runtime.runtime import init_params_fast_fn

            return init_params_fast_fn(
                lambda r: self.module.init(r, tower_args, ids, pids,
                                           method=ExactVLMModule.init_all),
                seed=seed)
        return self.module.init(rng, tower_args, ids, pids,
                                method=ExactVLMModule.init_all)

    def _prefill_decode(self, params, embeds, position_ids,
                        valid_lengths, *, max_new: int, capacity: int):
        s = self.spec
        c = s.text_cfg
        b, t, _ = embeds.shape
        cache = KVCache.create(c.layers, b, c.kv_heads, capacity,
                               c.head_dim, dtype=embeds.dtype)
        cache = cache.with_pad(t - valid_lengths)
        mask = combine_masks(create_causal_mask(t),
                             create_left_padding_mask(valid_lengths, t))
        mask = jnp.broadcast_to(mask, (b, 1, t, t))
        mask = jnp.concatenate(
            [mask, jnp.zeros((b, 1, t, capacity - t), bool)], -1)
        # delta layers have no KV-style per-slot mask — left-pad rows
        # are neutralized at fold time (True = real token)
        pad_mask = jnp.arange(t)[None, :] >= (t - valid_lengths)[:, None]
        logits, cache, dstate, conv = self.module.apply(
            params, embeds, position_ids, cache, mask,
            *self._empty_states(params, b),
            method=ExactVLMModule.prefill, pad_mask=pad_mask)
        cache = cache.advance(t)
        first = jnp.argmax(logits, -1).astype(jnp.int32)
        mrope = position_ids.ndim == 3
        if mrope:
            npos0 = jnp.max(position_ids, axis=(0, 2)) + 1
        else:
            npos0 = jnp.max(position_ids, axis=-1) + 1

        def step(carry, i):
            tok, cache, done, npos, ds, cv = carry
            pids = (jnp.broadcast_to(npos[None, :, None], (3, b, 1))
                    if mrope else npos[:, None])
            logits, cache, ds, cv = self.module.apply(
                params, tok, pids, cache, t + i, ds, cv,
                method=ExactVLMModule.decode_step)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            nxt = jnp.where(done, c.eos_id, nxt)
            return (nxt, cache, done | (nxt == c.eos_id), npos + 1,
                    ds, cv), tok

        (_, _, _, _, _, _), ids = jax.lax.scan(
            step, (first, cache, first == c.eos_id, npos0, dstate, conv),
            jnp.arange(max_new), length=max_new)
        return jnp.transpose(ids, (1, 0))

    def _empty_states(self, params, batch: int):
        c = self.spec.text_cfg
        d = c.linear_head_dim
        dstate = jnp.zeros((c.layers, batch, c.linear_v_heads, d, d),
                           jnp.float32)
        conv_dim = 2 * c.linear_k_heads * d + c.linear_v_heads * d
        conv = jnp.zeros((c.layers, batch, max(c.conv_kernel - 1, 1),
                          conv_dim), jnp.float32)
        return dstate, conv

    def _prepare_prompt(self, image, instruction: str):
        """tower encode + prompt row + fused embeds + position ids."""
        s = self.spec
        c = s.text_cfg
        tower_args, n_img = self._tower_inputs(image)
        img_emb = self._encode(self.params, *tower_args)
        prompt = self.tokenizer.encode(instruction)
        row = [c.eos_id] + [s.image_token_id % c.vocab_size] * n_img \
            + prompt
        ids = np.asarray(row, np.int32)
        t = len(row)
        if c.rope_kind == "mrope" and s.mrope_images:
            grid = getattr(self, "_last_grid", (2, 2))
            pids = qwen2vl_positions(
                t, 1, n_img, grid,
                getattr(self.vision_cfg, "merge", 2))[:, None, :]
        elif c.rope_kind == "mrope":
            pids = np.broadcast_to(np.arange(t, dtype=np.int32),
                                   (3, 1, t)).copy()
        else:
            pids = np.arange(t, dtype=np.int32)[None]
        embeds = self.module.apply(self.params, jnp.asarray(ids)[None],
                                   method=ExactVLMModule.embed)
        embeds = embeds.at[0, 1:1 + n_img].set(
            img_emb[:n_img].astype(embeds.dtype))
        return embeds, pids, t

    def generate(self, images: Sequence[np.ndarray],
                 instruction: str = "OCR:", *,
                 max_new_tokens: int = 64) -> List[str]:
        """Batched greedy generation: prompts are LEFT-padded to the batch
        max (the reference's batched-prefill convention; pad rows masked
        via KVCache.pad so unequal prompt lengths never attend padding —
        attention.rs:660-692)."""
        s = self.spec
        c = s.text_cfg
        if not images:
            return []
        prepared = [self._prepare_prompt(img, instruction)
                    for img in images]
        b = len(prepared)
        max_len = max(t for _, _, t in prepared)
        naxes = prepared[0][1].shape[0] if prepared[0][1].ndim == 3 else 0
        if naxes:
            pids = np.zeros((naxes, b, max_len), np.int32)
        else:
            pids = np.zeros((b, max_len), np.int32)
        valid = np.zeros((b,), np.int32)
        rows = []
        for i, (e, p, t) in enumerate(prepared):
            off = max_len - t
            # left-pad ON DEVICE (pad+concat are tiny per-shape programs
            # that recur across calls; pulling each (t, d) f32 embedding
            # to host to batch it shipped MBs down the slow d2h tunnel)
            rows.append(jnp.pad(e, ((0, 0), (off, 0), (0, 0)))
                        if off else e)
            if naxes:
                pids[:, i, off:] = p[:, 0]
            else:
                pids[i, off:] = p[0]
            valid[i] = t
        embeds = jnp.concatenate(rows, 0).astype(jnp.float32)
        capacity = decoder_cache_capacity(max_len, max_new_tokens)
        toks = self._gen(self.params, embeds,
                         jnp.asarray(pids), jnp.asarray(valid),
                         max_new=max_new_tokens, capacity=capacity)
        out = []
        for row in np.asarray(toks):
            ids_out = []
            for v_ in row.tolist():
                if v_ == c.eos_id:
                    break
                ids_out.append(int(v_))
            out.append(self.tokenizer.decode(ids_out))
        return out

    # ------------------ speculative generation (batch-1) ------------------
    def _spec_round_impl(self, params, tok, cache, dstate, conv, hist,
                         hist_len, npos, *, k: int, ngram: int):
        """One n-gram-draft → verify → rollback round. The KV cache rolls
        back by a length trim; the delta layers roll back by resuming from
        the verify block's per-step states at the accepted position
        (decode_block_spec) — the combination the reference avoids
        (vl/speculative.py module docstring)."""
        from .speculative import ngram_draft, verify_draft

        b = tok.shape[0]
        drafts = ngram_draft(hist, hist_len, k=k, n=ngram)   # (B, K)
        block = jnp.concatenate([tok[:, None], drafts], 1)   # (B, K+1)
        if self.spec.text_cfg.rope_kind == "mrope":
            pids = jnp.broadcast_to(
                npos[None, :, None] + jnp.arange(k + 1)[None, None, :],
                (3, b, k + 1))
        else:
            pids = npos[:, None] + jnp.arange(k + 1)[None, :]
        prev_len = cache.length
        logits, cache, step_ds, step_cs = self.module.apply(
            params, block, pids, cache, prev_len[0], dstate, conv,
            method=ExactVLMModule.decode_block_spec)
        res = verify_draft(drafts, logits)
        a0 = res.accepted[0]                                 # batch-1
        cache = cache.trim_to(prev_len[0] + 1 + a0)
        # resume states after step a0: step_ds holds DELTA layers only
        # (Ld, B, T, …); scatter the selection back into the full (L, B, …)
        # carry — full-attention rows pass through the block unchanged
        delta = self.spec.text_cfg.delta_layers()
        if delta:
            idx = jnp.asarray(delta, jnp.int32)
            dstate = dstate.at[idx].set(jnp.take(step_ds, a0, axis=2))
            conv = conv.at[idx].set(jnp.take(step_cs, a0, axis=2))
        next_tok = jnp.take_along_axis(res.next_tokens,
                                       res.accepted[:, None], axis=1)[:, 0]
        return (res.next_tokens, res.accepted, next_tok, cache, dstate,
                conv)

    def generate_speculative(self, images: Sequence[np.ndarray],
                             instruction: str = "OCR:", *,
                             max_new_tokens: int = 64, draft_k: int = 6,
                             ngram: int = 2,
                             stats: Optional[dict] = None) -> List[str]:
        """Greedy-exact speculative decoding for ANY exact stack —
        including hybrid delta-layer decoders (OvisOCR2), which the
        reference decodes strictly greedily (ovisocr2/model.rs has no
        speculative path). Draft source is training-free n-gram prompt
        lookup (vl/speculative.ngram_draft); every emitted token is a
        target argmax, so output matches :meth:`generate` token for token
        and only latency differs. Batch-1 per image, matching the
        reference's speculative-decode focus (hpd_parsing/model.rs).

        ``stats`` (optional dict) accumulates acceptance accounting
        across images: rounds, drafted, accepted, emitted (the
        metal_bench.rs-style decode evidence tools/vl_bench.py emits)."""
        import os

        if os.environ.get("OAR_TPU_DISABLE_SPECULATION"):
            return self.generate(images, instruction,
                                 max_new_tokens=max_new_tokens)
        c = self.spec.text_cfg
        spec_round = self._cached_jit(
            ("spec_round", draft_k, ngram),
            lambda: jax.jit(functools.partial(
                self._spec_round_impl, k=draft_k, ngram=ngram)))
        prefill = self._cached_jit(
            "prefill",
            lambda: jax.jit(functools.partial(
                self.module.apply, method=ExactVLMModule.prefill)))
        out: List[str] = []
        for image in images:
            embeds, pids_np, t = self._prepare_prompt(image, instruction)
            capacity = decoder_cache_capacity(
                t, max_new_tokens + draft_k + 1)
            cache = KVCache.create(c.layers, 1, c.kv_heads, capacity,
                                   c.head_dim, dtype=embeds.dtype)
            mask = jnp.broadcast_to(create_causal_mask(t), (1, 1, t, t))
            mask = jnp.concatenate(
                [mask, jnp.zeros((1, 1, t, capacity - t), bool)], -1)
            dstate, conv = self._empty_states(self.params, 1)
            pids = jnp.asarray(pids_np)
            logits, cache, dstate, conv = prefill(
                self.params, embeds, pids, cache, mask, dstate, conv)
            cache = cache.advance(t)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)   # (1,)
            if pids.ndim == 3:
                npos = jnp.max(pids, axis=(0, 2)) + 1
            else:
                npos = jnp.max(pids, axis=-1) + 1

            # token history for the drafter: prompt TEXT tokens (image
            # pads would only propose more image tokens) + generated
            prompt_ids = list(self.tokenizer.encode(instruction))
            hist_cap = int(decoder_cache_capacity(
                len(prompt_ids) + 1, max_new_tokens + draft_k + 1))
            hist = np.full((1, hist_cap), -1, np.int32)
            hist[0, :len(prompt_ids)] = prompt_ids
            hlen = len(prompt_ids)
            ids: List[int] = [int(tok[0])]
            hist[0, hlen] = ids[0]
            hlen += 1
            while len(ids) < max_new_tokens and ids[-1] != c.eos_id:
                emitted, acc, tok, cache, dstate, conv = spec_round(
                    self.params, tok, cache, dstate, conv,
                    jnp.asarray(hist),
                    jnp.asarray([hlen], np.int32), npos)
                n_acc = int(acc[0])
                if stats is not None:
                    stats["rounds"] = stats.get("rounds", 0) + 1
                    stats["drafted"] = stats.get("drafted", 0) + draft_k
                    stats["accepted"] = stats.get("accepted", 0) + n_acc
                    stats["emitted"] = stats.get("emitted", 0) + 1 + n_acc
                for v in np.asarray(emitted)[0, : n_acc + 1].tolist():
                    ids.append(int(v))
                    if hlen < hist_cap:
                        hist[0, hlen] = int(v)
                        hlen += 1
                    if v == c.eos_id or len(ids) >= max_new_tokens:
                        break
                npos = npos + 1 + n_acc
            row = []
            for v in ids:
                if v == c.eos_id:
                    break
                row.append(int(v))
            out.append(self.tokenizer.decode(row))
        return out


# ----------------------------- family factories -----------------------------

def mineru_exact(tiny: bool = False, **kw) -> ExactVLM:
    text = _tiny_text(MINERU_TEXT, mrope_sections=(2, 2, 2)) if tiny \
        else MINERU_TEXT
    vision = MinerUVisionConfig().tiny() if tiny else MinerUVisionConfig()
    spec = ExactVLMSpec("mineru", text, "qwen2vl", "visual", "model",
                        "lm_head", mrope_images=True)
    return ExactVLM(spec, vision, **kw)


def glm_exact(tiny: bool = False, **kw) -> ExactVLM:
    text = _tiny_text(GLM_TEXT) if tiny else GLM_TEXT
    vision = GlmVisionConfig().tiny() if tiny else GlmVisionConfig()
    spec = ExactVLMSpec("glmocr", text, "glm", "model.visual",
                        "model.language_model", "lm_head")
    return ExactVLM(spec, vision, **kw)


def ovis_exact(tiny: bool = False, **kw) -> ExactVLM:
    text = _tiny_text(OVIS_TEXT, layers=4, linear_head_dim=8) if tiny \
        else OVIS_TEXT
    vision = OvisVisionConfig().tiny() if tiny else OvisVisionConfig()
    spec = ExactVLMSpec("ovisocr2", text, "ovis", "model.visual",
                        "model.language_model", "lm_head")
    return ExactVLM(spec, vision, **kw)


def hpd_exact(tiny: bool = False, **kw) -> ExactVLM:
    text = _tiny_text(SDAR_TEXT) if tiny else SDAR_TEXT
    vision = HpdVisionConfig().tiny() if tiny else HpdVisionConfig()
    # HPD's checkpoint keeps the vision tree at the ROOT (vision_model./
    # mlp1.); here it nests under "hpd_vision" (flax submodules need a
    # name) — the conversion map strips that one prefix
    spec = ExactVLMSpec("hpd_parsing", text, "internvit", "hpd_vision",
                        "language_model.model", "language_model.lm_head")
    return ExactVLM(spec, vision, **kw)


def monkey_exact(tiny: bool = False, **kw) -> ExactVLM:
    text = _tiny_text(SDAR_TEXT) if tiny else SDAR_TEXT
    vision = MonkeyVisionConfig().tiny() if tiny else MonkeyVisionConfig()
    spec = ExactVLMSpec("monkeyocrv2", text, "monkey", "vision_tower",
                        "model", "lm_head")
    return ExactVLM(spec, vision, **kw)


# Registry-name → exact-stack factory (the construction surface real
# checkpoints load through; families.FAMILY_CLASSES remains the
# mechanism harness — ROADMAP "converge at conversion time")
EXACT_FACTORIES = {
    "mineru-2.5": mineru_exact,
    "mineru-2.5-pro": mineru_exact,
    "glm-ocr": glm_exact,
    "ovisocr2-0.8b": ovis_exact,
    "hpd-parsing-1b": hpd_exact,
    "monkeyocrv2-s": monkey_exact,
    "monkeyocrv2-b": monkey_exact,
}


def exact_from_registry(name: str, **kw):
    """Construct the exact architecture for a VLM registry entry
    (registry/models.py names). PaddleOCR-VL and HunyuanOCR have their
    own full modules (vl/model.PaddleOCRVL, vl/hunyuan.HunyuanOCRModel)."""
    tiny = kw.pop("tiny", False)
    if name.startswith("paddleocr-vl"):
        from .model import PaddleOCRVL
        from .paddleocr_vl import PaddleOCRVLConfig

        cfg = PaddleOCRVLConfig().tiny() if tiny else PaddleOCRVLConfig()
        return PaddleOCRVL(cfg=cfg, **kw)
    if name.startswith("hunyuanocr"):
        from .hunyuan import HunyuanOCRConfig, HunyuanOCRModel

        cfg = HunyuanOCRConfig().tiny() if tiny else HunyuanOCRConfig()
        return HunyuanOCRModel(cfg=cfg, **kw)
    kw["tiny"] = tiny
    if name == "mineru-diffusion-v1":
        kw.setdefault("tiny", tiny)
        return mineru_diffusion_exact(**kw)
    try:
        return EXACT_FACTORIES[name](**kw)
    except KeyError:
        from ..errors import InvalidInputError

        raise InvalidInputError("unknown exact VLM registry name",
                                name=name,
                                known=sorted(EXACT_FACTORIES)) from None


class SdarDiffusionExact(ExactVLM):
    """MinerU-Diffusion on the exact stack: SDAR/Qwen3 decoder + MinerU
    tower, decoding by block diffusion (bidirectional trials → confidence
    unmasking → causal KV commit; vl/diffusion.py schedule,
    mineru_diffusion/model.rs:1-12)."""

    MASK_TOKEN_OFFSET = 1

    def generate(self, images, instruction: str = "OCR:", *,
                 max_new_tokens: int = 64, block_len: int = 8,
                 num_unmask_steps: int = 4,
                 confidence_threshold: float = 0.9):
        import functools

        from .diffusion import MASK_ID, transfer_count, unmask_step

        c = self.spec.text_cfg
        mask_tok = c.vocab_size - self.MASK_TOKEN_OFFSET
        bidir = self._cached_jit(
            "decode_block_bidir",
            lambda: jax.jit(functools.partial(
                self.module.apply,
                method=ExactVLMModule.decode_block_bidir)))
        commit = self._cached_jit(
            "decode_block_causal",
            lambda: jax.jit(functools.partial(
                self.module.apply,
                method=ExactVLMModule.decode_block_causal)))
        prefill = self._cached_jit(
            "prefill",
            lambda: jax.jit(functools.partial(
                self.module.apply, method=ExactVLMModule.prefill)))
        out = []
        for image in images:
            embeds, pids, t = self._prepare_prompt(image, instruction)
            n_blocks = max(1, -(-max_new_tokens // block_len))
            capacity = decoder_cache_capacity(
                t, n_blocks * block_len + block_len)
            cache = KVCache.create(c.layers, 1, c.kv_heads, capacity,
                                   c.head_dim, dtype=embeds.dtype)
            mask = jnp.broadcast_to(create_causal_mask(t), (1, 1, t, t))
            mask = jnp.concatenate(
                [mask, jnp.zeros((1, 1, t, capacity - t), bool)], -1)
            ds, cv = self._empty_states(self.params, 1)
            _, cache, ds, cv = prefill(self.params, embeds,
                                       jnp.asarray(pids), cache, mask,
                                       ds, cv)
            cache = cache.advance(t)
            wpos = t
            ids: List[int] = []
            done = False
            for _ in range(n_blocks):
                if done:
                    break
                tokens = np.full((1, block_len), MASK_ID, np.int64)
                bp = wpos + np.arange(block_len, dtype=np.int32)
                bpids = (np.broadcast_to(bp[None, None], (3, 1, block_len))
                         if self.spec.text_cfg.rope_kind == "mrope"
                         else bp[None])
                for s_i in range(num_unmask_steps):
                    if not (tokens == MASK_ID).any():
                        break
                    feed = np.where(tokens == MASK_ID, mask_tok, tokens)
                    logits, _c, _d, _v = bidir(
                        self.params, jnp.asarray(feed, jnp.int32),
                        jnp.asarray(bpids), cache, wpos, ds, cv)
                    prev = (transfer_count(s_i - 1, num_unmask_steps,
                                           block_len) if s_i else 0)
                    tokens = np.asarray(unmask_step(
                        jnp.asarray(tokens.astype(np.int32)), logits,
                        confidence_threshold=confidence_threshold,
                        min_transfer=transfer_count(
                            s_i, num_unmask_steps, block_len) - prev)
                    ).astype(np.int64)
                _, cache, ds, cv = commit(
                    self.params, jnp.asarray(tokens.astype(np.int32)),
                    jnp.asarray(bpids), cache, wpos, ds, cv)
                wpos += block_len
                for v_ in tokens[0].tolist():
                    if v_ == c.eos_id:
                        done = True
                        break
                    ids.append(int(v_))
            out.append(self.tokenizer.decode(ids[:max_new_tokens]))
        return out


def mineru_diffusion_exact(tiny: bool = False, **kw) -> SdarDiffusionExact:
    text = _tiny_text(SDAR_TEXT) if tiny else SDAR_TEXT
    vision = MinerUVisionConfig().tiny() if tiny else MinerUVisionConfig()
    spec = ExactVLMSpec("mineru_diffusion", text, "qwen2vl",
                        "vision_tower", "language_model.model",
                        "language_model.lm_head")
    return SdarDiffusionExact(spec, vision, **kw)


class GlmSpeculativeExact(ExactVLM):
    """GLM-OCR with its trained MTP draft on the exact stack: the draft
    (llm_decoders.GlmMtpHead — the checkpoint's extra layers.{L} entry)
    proposes K tokens recurrently from (prev_hidden, token), one causal
    target pass verifies (glmocr/mtp.rs draft loop + text.rs verify).
    Greedy-exact by construction (vl/speculative.verify_draft)."""

    def __init__(self, spec, vision_cfg, params=None, *, draft_k: int = 4,
                 mtp_params=None, **kw):
        from .llm_decoders import GlmMtpHead

        super().__init__(spec, vision_cfg, params, **kw)
        self.draft_k = draft_k
        c = spec.text_cfg
        self.mtp = GlmMtpHead(c)
        if mtp_params is None:
            cache = KVCache.create(1, 1, c.kv_heads, 8, c.head_dim,
                                   dtype=jnp.float32)

            def init(r):
                return self.mtp.init(
                    r, jnp.zeros((1, 1), jnp.int32),
                    jnp.zeros((1, 1, c.hidden), jnp.float32),
                    jnp.zeros((1, 1), jnp.int32), cache, jnp.int32(0),
                    jnp.ones((1, 1, 1, 8), bool))

            if kw.get("fast_init"):
                from ..runtime.runtime import init_params_fast_fn

                mtp_params = init_params_fast_fn(init, seed=11)
            else:
                mtp_params = init(jax.random.PRNGKey(11))
        self.mtp_params = self.runtime.put_params_vl(mtp_params)

    def _spec_round(self, params, mparams, h, tok, cache, mtp_cache,
                    wpos, *, k: int):
        from .speculative import verify_draft

        c = self.spec.text_cfg
        b = tok.shape[0]

        # K recurrent draft steps through the trained MTP layer, each
        # appending to the draft's own KV cache
        drafts = []
        cur_tok, cur_h = tok, h
        for i in range(k):
            pids = (wpos + i)[None, None] * jnp.ones((b, 1), jnp.int32)
            cap = mtp_cache.capacity
            col = jnp.arange(cap)[None, None, None, :]
            mask = col < (mtp_cache.length[:, None, None, None] + 1)
            logits, hid, mtp_cache = self.mtp.apply(
                mparams, cur_tok[:, None], cur_h[:, None], pids,
                mtp_cache, wpos + i, mask)
            mtp_cache = mtp_cache.advance(1)
            cur_h = hid[:, -1]
            cur_tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            drafts.append(cur_tok)
        drafts = jnp.stack(drafts, axis=1)                 # (B, K)

        block = jnp.concatenate([tok[:, None], drafts], 1)
        bp = wpos + jnp.arange(k + 1)
        bpids = bp[None]
        prev_len = cache.length
        ds, cv = self._empty_states(params, b)
        t_logits, t_hidden, cache, _, _ = self.module.apply(
            params, block, bpids, cache, wpos, ds, cv,
            method=ExactVLMModule.decode_block_hidden)
        res = verify_draft(drafts, t_logits)
        a = res.accepted
        cache = cache.trim_to(prev_len[0] + 1 + a[0])
        mtp_cache = mtp_cache.trim_to(prev_len[0] + 1 + a[0])
        next_tok = jnp.take_along_axis(res.next_tokens, a[:, None],
                                       axis=1)[:, 0]
        # the draft's next prev-hidden: the TARGET hidden at the last
        # accepted position (the hidden whose argmax emitted next_tok —
        # glmocr/mtp.rs feeds target hiddens into the draft stream)
        h_next = jnp.take_along_axis(
            t_hidden, a[:, None, None], axis=1)[:, 0]
        return res.next_tokens, a, next_tok, h_next, cache, mtp_cache

    def generate_speculative(self, images, instruction: str = "OCR:", *,
                             max_new_tokens: int = 64,
                             stats: Optional[dict] = None):
        import functools

        c = self.spec.text_cfg
        k = self.draft_k
        prefill = self._cached_jit(
            "prefill_hidden_all",
            lambda: jax.jit(functools.partial(
                self.module.apply, method=ExactVLMModule.prefill_hidden_all)))
        mtp_prefill = self._cached_jit(
            "mtp_prefill",
            lambda: jax.jit(lambda mp, emb, ph, pids_, cch, msk:
                            self.mtp.apply(mp, None, ph, pids_, cch,
                                           jnp.int32(0), msk, emb=emb)))
        rnd = self._cached_jit(
            ("mtp_round", k),
            lambda: jax.jit(functools.partial(self._spec_round, k=k)))
        out = []
        for image in images:
            embeds, pids, t = self._prepare_prompt(image, instruction)
            capacity = decoder_cache_capacity(t, max_new_tokens + k + 1)
            cache = KVCache.create(c.layers, 1, c.kv_heads, capacity,
                                   c.head_dim, dtype=embeds.dtype)
            mtp_cache = KVCache.create(1, 1, c.kv_heads, capacity,
                                       c.head_dim, dtype=embeds.dtype)
            mask = jnp.broadcast_to(create_causal_mask(t), (1, 1, t, t))
            mask = jnp.concatenate(
                [mask, jnp.zeros((1, 1, t, capacity - t), bool)], -1)
            ds, cv = self._empty_states(self.params, 1)
            logits, hiddens, cache, ds, cv = prefill(
                self.params, embeds, jnp.asarray(pids), cache,
                mask, ds, cv)
            cache = cache.advance(t)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            # MTP PREFILL over the prompt (glmocr/mtp.rs prefill
            # stream): position j consumes (embeds[j+1], hidden[j]);
            # the last pair uses the first generated token's embedding.
            # Without this the draft cache holds t all-zero K/V slots
            # and every draft attention dilutes to ~uniform — the
            # acceptance-0 floor the VL bench used to measure.
            emb_next = self.module.apply(
                self.params, tok[:, None], method=ExactVLMModule.embed)
            emb_mtp = jnp.concatenate(
                [embeds[:, 1:], emb_next.astype(embeds.dtype)], axis=1)
            _, _, mtp_cache = mtp_prefill(
                self.mtp_params, emb_mtp, hiddens,
                jnp.arange(t, dtype=jnp.int32)[None, :], mtp_cache, mask)
            mtp_cache = mtp_cache.advance(t)
            h = hiddens[:, -1]         # target hidden, not an embedding
            wpos = t
            ids = [int(tok[0])]
            while len(ids) < max_new_tokens and ids[-1] != c.eos_id:
                emitted, a, tok, h, cache, mtp_cache = rnd(
                    self.params, self.mtp_params, h, tok, cache,
                    mtp_cache, jnp.int32(wpos))
                n_acc = int(a[0])
                if stats is not None:
                    stats["rounds"] = stats.get("rounds", 0) + 1
                    stats["drafted"] = stats.get("drafted", 0) + k
                    stats["accepted"] = stats.get("accepted", 0) + n_acc
                    stats["emitted"] = stats.get("emitted", 0) + 1 + n_acc
                for v_ in np.asarray(emitted)[0, : n_acc + 1].tolist():
                    ids.append(int(v_))
                    if v_ == c.eos_id or len(ids) >= max_new_tokens:
                        break
                wpos += 1 + n_acc
            final = [i for i in ids if i != c.eos_id]
            out.append(self.tokenizer.decode(final))
        return out


def glm_speculative_exact(tiny: bool = False, **kw) -> GlmSpeculativeExact:
    text = _tiny_text(GLM_TEXT) if tiny else GLM_TEXT
    vision = GlmVisionConfig().tiny() if tiny else GlmVisionConfig()
    spec = ExactVLMSpec("glmocr", text, "glm", "model.visual",
                        "model.language_model", "lm_head")
    return GlmSpeculativeExact(spec, vision, **kw)


class HpdForkExact(ExactVLM):
    """HPD-Parsing fork decoding on the exact stack (InternViT tiles +
    SDAR decoder), driven by the continuous-batching scheduler
    (vl/hpd_scheduler.py — hpd_parsing/model.rs:467-723): every emitted
    ``<FORK>`` spawns a child whose KV is the parent's cache at the fork
    position; children join the RUNNING decode batch with admission
    priority; P-MTP drafts 6 tokens per branch per round."""

    FORK_TOKEN = "<FORK>"
    CHILD_TOKEN = "<CHILD>"
    # ByteTokenizer reserves ids 0..127 for specials (vl/model.py); the
    # real checkpoint config pins 151679/151680 (hpd config.rs:54-55)
    DEV_FORK_ID = 2
    DEV_CHILD_ID = 3

    def _special_ids(self):
        fork = self.tokenizer.encode(self.FORK_TOKEN)
        child = self.tokenizer.encode(self.CHILD_TOKEN)
        if len(fork) == 1 and len(child) == 1:
            return fork[0], child[0]
        return self.DEV_FORK_ID, self.DEV_CHILD_ID

    def _scheduler(self, use_mtp: bool):
        from .hpd_scheduler import HpdContinuousScheduler

        key = "_sched_mtp" if use_mtp else "_sched"
        sched = getattr(self, key, None)
        if sched is None:
            fork_id, child_id = self._special_ids()
            sched = HpdContinuousScheduler(
                self, fork_token_id=fork_id, child_token_id=child_id)
            setattr(self, key, sched)
        return sched

    def parse_with_forks(self, image: np.ndarray, *,
                         instruction: str = "Parse:",
                         max_new_tokens: int = 48,
                         max_children: int = 8,
                         use_mtp: bool = False,
                         num_speculative_tokens: int = 6,
                         max_active_branches: int = 64):
        import functools

        from .hpd_scheduler import HpdSchedulerConfig

        c = self.spec.text_cfg
        prefill = self._cached_jit(
            "prefill_hidden",
            lambda: jax.jit(functools.partial(
                self.module.apply, method=ExactVLMModule.prefill_hidden)))
        embeds, pids, t = self._prepare_prompt(image, instruction)
        capacity = decoder_cache_capacity(t + max_new_tokens,
                                          max_new_tokens)
        cache = KVCache.create(c.layers, 1, c.kv_heads, capacity,
                               c.head_dim, dtype=embeds.dtype)
        mask = jnp.broadcast_to(create_causal_mask(t), (1, 1, t, t))
        mask = jnp.concatenate(
            [mask, jnp.zeros((1, 1, t, capacity - t), bool)], -1)
        ds, cv = self._empty_states(self.params, 1)
        logits, last_h, cache, ds, cv = prefill(
            self.params, embeds, jnp.asarray(pids), cache, mask, ds, cv)
        prefix_cache = cache.advance(t)
        first = int(jnp.argmax(logits, -1)[0])

        sched = self._scheduler(use_mtp)
        out = sched.run(prefix_cache, first, last_h,
                        HpdSchedulerConfig(
                            max_new_tokens=max_new_tokens,
                            use_mtp=use_mtp,
                            num_speculative_tokens=num_speculative_tokens,
                            max_active_branches=max_active_branches))

        drop = {c.eos_id, sched.fork_token_id, sched.child_token_id}
        parent = self.tokenizer.decode(
            [i for i in out.parent_tokens if i not in drop])
        children = [self.tokenizer.decode(
            [i for i in row if i not in drop])
            for row in out.children[:max_children]]
        st = out.stats
        # stats mirror HpdRuntimeStats (hpd_parsing/model.rs:71)
        return {"parent": parent, "children": children,
                "token_ids": out.token_ids,
                "stats": {"prefix_len": t,
                          "parent_tokens": sum(
                              1 for i in out.parent_tokens
                              if i != c.eos_id),
                          "num_children": len(out.children),
                          "child_tokens": sum(
                              sum(1 for i in row if i != c.eos_id)
                              for row in out.children),
                          "scheduler_rounds": st.scheduler_rounds,
                          "peak_active_branches": st.peak_active_branches,
                          "forked_branches": st.forked_branches,
                          "shared_prefix_tokens": st.shared_prefix_tokens,
                          "mtp_drafted_tokens": st.mtp_drafted_tokens,
                          "mtp_accepted_tokens": st.mtp_accepted_tokens}}

def hpd_fork_exact(tiny: bool = False, **kw) -> HpdForkExact:
    text = _tiny_text(SDAR_TEXT) if tiny else SDAR_TEXT
    vision = HpdVisionConfig().tiny() if tiny else HpdVisionConfig()
    spec = ExactVLMSpec("hpd_parsing", text, "internvit", "hpd_vision",
                        "language_model.model", "language_model.lm_head")
    return HpdForkExact(spec, vision, **kw)

"""PaddleOCR-VL orchestrator: preprocess → prefill → fused decode loop.

Re-expresses oar-ocr-vl/src/paddleocr_vl/model.rs:212-599
(generate_tokens): image preprocessing via smart_resize, prompt assembly
with image placeholder tokens (:302-336), batched left-padded prefill
(:452-467), the greedy decode loop (:514-570), and tokenizer decode
(:599).

TPU-first: the decode loop is a `lax.scan` running entirely on device —
one compiled program per (batch, prompt-bucket, KV-capacity) triple with
the KV cache donated between steps; token ids return to the host once,
after the loop (vs. the reference's per-step device sync + CUDA graphs).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import InvalidInputError
from ..runtime.runtime import Runtime
from ..utils.tracing import stage_timer
from .attention import (combine_masks, create_causal_mask,
                        create_left_padding_mask)
from .kv_cache import KVCache, decoder_cache_capacity
from .paddleocr_vl import (TASK_PROMPTS, PaddleOCRVLConfig,
                           postprocess_task_output,
                           PaddleOCRVLModule)
from .processing import VisionProcessorConfig, smart_resize


class ByteTokenizer:
    """Reversible development tokenizer (UTF-8 bytes + specials). Real
    deployments load the converted model's HF tokenizer via
    ``HFTokenizer``."""

    OFFSET = 128  # ids 0..127 reserved for specials

    def encode(self, text: str) -> List[int]:
        return [b + self.OFFSET for b in text.encode("utf-8")]

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i - self.OFFSET for i in ids
                     if self.OFFSET <= i < self.OFFSET + 256)
        return data.decode("utf-8", errors="replace")


class HFTokenizer:
    def __init__(self, path: str):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(path)

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text).ids

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(ids))


@dataclass
class GenerationResult:
    text: str
    token_ids: List[int]
    num_prompt_tokens: int


class PaddleOCRVL:
    """Public VLM entry: images + task → text."""

    def __init__(self, params=None, *, cfg: Optional[PaddleOCRVLConfig] = None,
                 tokenizer=None, runtime: Optional[Runtime] = None,
                 seed: int = 0, fast_init: bool = False):
        self.runtime = runtime or Runtime.default()
        self.cfg = cfg or PaddleOCRVLConfig()
        self.vcfg = VisionProcessorConfig(patch_size=self.cfg.v_patch,
                                          merge_size=self.cfg.v_merge)
        self.tokenizer = tokenizer or ByteTokenizer()
        self.module = PaddleOCRVLModule(self.cfg)
        if params is None:
            # fast_init: shape-only eval + host randoms so the FULL-SIZE
            # config constructs without eager flax init (vl_bench)
            params = self._init_params(seed, fast=fast_init)
        self.params = self.runtime.put_params_vl(params)
        self._encode_vision = jax.jit(
            lambda p, patches, valid, h_ids, w_ids, pe: self.module.apply(
                p, patches, valid, h_ids, w_ids, pe,
                method=PaddleOCRVLModule.encode_vision))
        self._embed_tokens = jax.jit(
            lambda p, i: self.module.apply(
                p, i, method=PaddleOCRVLModule.embed_tokens))
        # text-embed + image-span scatter in ONE device program: the
        # fused (B, T, hidden) prompt embedding never crosses the link
        # (a host-side scatter shipped ~MBs down the 40-50 MB/s d2h
        # tunnel per generate call)
        self._fuse_embeds = jax.jit(self._fuse_embeds_impl)
        self._prefill_decode = jax.jit(
            self._prefill_decode_impl, static_argnames=("max_new", "capacity"))
        # host copy of the learned position table for per-grid bilinear
        # interpolation (vision.rs interpolate_pos_encoding — grids are
        # dynamic per image; the table is tiny)
        self._pos_table = np.asarray(self.module.apply(
            self.params, method=PaddleOCRVLModule.position_table
        ).astype(jnp.float32))

    def _init_params(self, seed: int, fast: bool = False):
        c = self.cfg
        rng = jax.random.PRNGKey(seed)
        t = (self.cfg.v_merge ** 2)
        patches = jnp.zeros((1, t, c.v_patch * c.v_patch * 3), jnp.float32)
        valid = jnp.ones((1, t), bool)
        ids = jnp.zeros((1, 4), jnp.int32)
        pos = jnp.zeros((3, 1, 4), jnp.int32)
        if fast:
            from ..runtime.runtime import init_params_fast_fn

            return init_params_fast_fn(
                lambda r: self.module.init(
                    r, patches, valid, ids, pos,
                    method=PaddleOCRVLModule.init_all), seed=seed)
        return self.module.init(rng, patches, valid, ids, pos,
                                method=PaddleOCRVLModule.init_all)

    def _interp_pos_embed(self, gh: int, gw: int) -> np.ndarray:
        """Bilinear align_corners=False interpolation of the learned
        (grid², v_dim) table to (gh·gw, v_dim), in the host block order
        _prepare_image emits (vision.rs interpolate_pos_encoding)."""

        table = self._pos_table
        g = int(round(len(table) ** 0.5))
        grid = table.reshape(g, g, -1)

        def axis_weights(dst, src):
            pos = np.clip((np.arange(dst) + 0.5) * src / dst - 0.5,
                          0, src - 1)
            lo = np.floor(pos).astype(np.int64)
            hi = np.minimum(lo + 1, src - 1)
            f = (pos - lo)[:, None]
            return lo, hi, f

        ylo, yhi, fy = axis_weights(gh, g)
        xlo, xhi, fx = axis_weights(gw, g)
        top = grid[ylo][:, xlo] * (1 - fx) + grid[ylo][:, xhi] * fx
        bot = grid[yhi][:, xlo] * (1 - fx) + grid[yhi][:, xhi] * fx
        out = top * (1 - fy[:, None]) + bot * fy[:, None]
        # reorder raster (gh, gw) → the 2×2-block token order
        m = self.cfg.v_merge
        out = out.reshape(gh // m, m, gw // m, m, -1)
        out = out.transpose(0, 2, 1, 3, 4)
        return out.reshape(gh * gw, -1).astype(np.float32)

    # ------------------------------------------------------------------
    def _fuse_embeds_impl(self, params, ids, img_embeds, starts, counts):
        """Embed the token ids and overwrite each row's image span
        [starts[i], starts[i]+counts[i]) with that row's vision embeds —
        all on device (the span bounds are host-known; only the scatter
        pattern ships, never the embeddings)."""
        embeds = self.module.apply(params, ids,
                                   method=PaddleOCRVLModule.embed_tokens)
        t = ids.shape[1]
        ti = img_embeds.shape[1]
        idx = jnp.arange(t)[None, :] - starts[:, None]          # (B, T)
        take = (idx >= 0) & (idx < counts[:, None])
        gathered = jnp.take_along_axis(
            img_embeds, jnp.clip(idx, 0, ti - 1)[:, :, None], axis=1)
        return jnp.where(take[:, :, None],
                         gathered.astype(embeds.dtype), embeds)

    def _prefill_decode_impl(self, params, embeds, position_ids,
                             valid_lengths, *, max_new: int, capacity: int):
        """One program: prefill + scan decode. Returns (ids (B, max_new))."""

        c = self.cfg
        b, t, _ = embeds.shape
        cache = KVCache.create(c.layers, b, c.kv_heads, capacity,
                               c.head_dim, dtype=embeds.dtype)
        cache = cache.with_pad(t - valid_lengths)
        causal = create_causal_mask(t)
        pad = create_left_padding_mask(valid_lengths, t)
        full = combine_masks(causal, pad)
        full = jnp.concatenate(
            [jnp.broadcast_to(full, (b, 1, t, t)),
             jnp.zeros((b, 1, t, capacity - t), bool)], -1)
        logits, cache = self.module.apply(
            params, embeds, position_ids, cache, full,
            method=PaddleOCRVLModule.prefill)
        cache = cache.advance(t)
        first = jnp.argmax(logits, -1).astype(jnp.int32)
        next_pos = jnp.max(position_ids, axis=(0, 2)) + 1      # (B,)

        def step(carry, i):
            tok, cache, done, npos = carry
            pos_ids = jnp.broadcast_to(npos[None, :, None], (3, b, 1))
            logits, cache = self.module.apply(
                params, tok, pos_ids, cache, t + i,
                method=PaddleOCRVLModule.decode_step)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            nxt = jnp.where(done, c.eos_id, nxt)
            done = done | (nxt == c.eos_id)
            return (nxt, cache, done, npos + 1), tok

        done0 = first == c.eos_id
        (_, cache, _, _), ids = jax.lax.scan(
            step, (first, cache, done0, next_pos),
            jnp.arange(max_new), length=max_new)
        return jnp.transpose(ids, (1, 0))     # (B, max_new)

    # ------------------------------------------------------------------
    def _prepare_image(self, image: np.ndarray,
                       spotting: bool = False,
                       ) -> Tuple[np.ndarray, Tuple[int, int],
                                  np.ndarray, np.ndarray]:
        """smart_resize + patchify → ((T, patch²·3) float32, grid,
        h_ids, w_ids). Patches are emitted in 2×2-block order so the
        projector's static reshape merges spatial neighbors; h/w ids
        carry the ORIGINAL raster grid position per patch for the 2-D
        vision rope and the interpolated position embedding.

        ``spotting`` (model.rs:255-295): small pages are 2×-pre-upscaled
        with Lanczos and max_pixels is widened — see
        processing.spotting_preprocess_plan."""
        import cv2

        from .processing import spotting_preprocess_plan

        vcfg = self.vcfg
        h, w = image.shape[:2]
        if spotting:
            (uh, uw), vcfg = spotting_preprocess_plan(h, w, vcfg)
            if (uh, uw) != (h, w):
                image = cv2.resize(image, (uw, uh),
                                   interpolation=cv2.INTER_LANCZOS4)
                h, w = uh, uw
        th, tw = smart_resize(h, w, vcfg)
        resized = cv2.resize(image, (tw, th), interpolation=cv2.INTER_LINEAR)
        x = resized.astype(np.float32) / 255.0
        x = (x - 0.5) / 0.5
        p = self.cfg.v_patch
        gh, gw = th // p, tw // p
        m = self.cfg.v_merge
        x = x.reshape(gh // m, m, p, gw // m, m, p, 3)
        x = x.transpose(0, 3, 1, 4, 2, 5, 6)   # (gh/m, gw/m, m, m, p, p, 3)
        patches = x.reshape(gh * gw, p * p * 3)
        hh, ww = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        ids = np.stack([hh, ww], -1).reshape(gh // m, m, gw // m, m, 2)
        ids = ids.transpose(0, 2, 1, 3, 4).reshape(gh * gw, 2)
        return patches, (gh, gw), ids[:, 0].astype(np.int32), \
            ids[:, 1].astype(np.int32)

    def generate(self, images: Sequence[np.ndarray], task: str = "ocr",
                 *, max_new_tokens: int = 512, raw: bool = False,
                 min_capacity: int = 0) -> List[GenerationResult]:
        """``raw=True`` skips the per-task output postprocess — the
        ``generate_with_raw`` path (doc_parser.rs:459) callers use when
        they must truncate repetition BEFORE task postprocessing.
        ``min_capacity`` pins the KV bucket to at least this size —
        serving loops (and tools/vl_bench.py) use it to keep mixed
        request sizes on ONE compiled program instead of recompiling per
        pow2 bucket."""
        if task not in TASK_PROMPTS:
            raise InvalidInputError("unknown task", task=task,
                                    known=sorted(TASK_PROMPTS))
        if not images:
            return []
        try:
            return self._generate_batch(images, task,
                                        max_new_tokens=max_new_tokens,
                                        raw=raw,
                                        min_capacity=min_capacity)
        except Exception:
            if len(images) == 1:
                raise
            # per-image error isolation: a batch failure degrades to
            # per-item results instead of failing the whole batch
            # (paddleocr_vl/model.rs:231-243)
            out: List[GenerationResult] = []
            for im in images:
                try:
                    out.extend(self._generate_batch(
                        [im], task, max_new_tokens=max_new_tokens,
                        raw=raw, min_capacity=min_capacity))
                except Exception:
                    from ..utils.tracing import logger

                    logger.warning("VLM generation failed for one image",
                                   exc_info=True)
                    out.append(GenerationResult(text="", token_ids=[],
                                                num_prompt_tokens=0))
            return out

    def _generate_batch(self, images: Sequence[np.ndarray], task: str,
                        *, max_new_tokens: int, raw: bool = False,
                        min_capacity: int = 0) -> List[GenerationResult]:
        c = self.cfg

        # --- vision; the spotting task 2×-pre-upscales small pages and
        # widens max_pixels (model.rs:255-295) ---
        prepared = [self._prepare_image(im, spotting=task == "spotting")
                    for im in images]
        max_t = max(p.shape[0] for p, _, _, _ in prepared)
        m2 = c.v_merge ** 2
        max_t = ((max_t + m2 - 1) // m2) * m2
        b = len(images)
        patch_dim = c.v_patch * c.v_patch * 3
        patch_batch = np.zeros((b, max_t, patch_dim), np.float32)
        valid = np.zeros((b, max_t), bool)
        h_ids = np.zeros((b, max_t), np.int32)
        w_ids = np.zeros((b, max_t), np.int32)
        pos_embed = np.zeros((b, max_t, c.v_dim), np.float32)
        for i, (p, (gh, gw), hi, wi) in enumerate(prepared):
            patch_batch[i, : p.shape[0]] = p
            valid[i, : p.shape[0]] = True
            h_ids[i, : p.shape[0]] = hi
            w_ids[i, : p.shape[0]] = wi
            pos_embed[i, : p.shape[0]] = self._interp_pos_embed(gh, gw)
        with stage_timer("vl.vision", batch=b, tokens=max_t):
            img_embeds = self._encode_vision(
                self.params, jnp.asarray(patch_batch, self.runtime.compute_dtype),
                jnp.asarray(valid), jnp.asarray(h_ids), jnp.asarray(w_ids),
                jnp.asarray(pos_embed, self.runtime.compute_dtype))

        # --- prompts (model.rs:312-313 template) ---
        prompt_rows = []
        for i, (p, (gh, gw), _hi, _wi) in enumerate(prepared):
            n_tok = p.shape[0] // m2
            prefix = self.tokenizer.encode("User: ")
            suffix = self.tokenizer.encode(
                f"{TASK_PROMPTS[task]}\nAssistant: ")
            row = (prefix + [c.image_start_id] + [c.image_pad_id] * n_tok
                   + [c.image_end_id] + suffix)
            prompt_rows.append(row)

        max_len = max(len(r) for r in prompt_rows)
        ids = np.full((b, max_len), 0, np.int32)
        valid_lengths = np.zeros((b,), np.int32)
        positions = np.zeros((3, b, max_len), np.int32)
        img_positions = []
        for i, row in enumerate(prompt_rows):
            off = max_len - len(row)            # left padding (model.rs:452)
            ids[i, off:] = row
            valid_lengths[i] = len(row)
            # the grid the vision tower ACTUALLY saw — including the
            # spotting 2x-pre-upscale + widened max_pixels, which a
            # fresh smart_resize of the original image would miss
            gh, gw = prepared[i][1]
            positions[:, i, :], span = _mrope_positions(
                row, off, max_len, (gh // c.v_merge, gw // c.v_merge),
                c.image_pad_id)
            img_positions.append(span)

        # --- fuse embeds on device: text embedding + image-span scatter ---
        embeds = self._fuse_embeds(
            self.params, jnp.asarray(ids), img_embeds,
            jnp.asarray(np.array([s for s, _ in img_positions], np.int32)),
            jnp.asarray(np.array([n for _, n in img_positions], np.int32)))

        capacity = max(decoder_cache_capacity(max_len, max_new_tokens),
                       min_capacity)
        with stage_timer("vl.generate", batch=b, prompt=max_len,
                         capacity=capacity):
            out_ids = self._prefill_decode(
                self.params, embeds,
                jnp.asarray(positions),
                jnp.asarray(valid_lengths),
                max_new=max_new_tokens, capacity=capacity)
            out_ids = np.asarray(out_ids)

        results = []
        for i in range(b):
            row = out_ids[i].tolist()
            if c.eos_id in row:
                row = row[: row.index(c.eos_id)]
            decoded = self.tokenizer.decode(row)
            results.append(GenerationResult(
                text=decoded if raw else postprocess_task_output(decoded,
                                                                 task),
                token_ids=row,
                num_prompt_tokens=int(valid_lengths[i])))
        return results


def _mrope_positions(row: List[int], offset: int, total: int,
                     grid_hw: Tuple[int, int], image_pad_id: int
                     ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """3-D MRoPE positions for one left-padded prompt row (Qwen2-VL
    convention, ernie.rs:26): text advances all axes together; image
    tokens share one temporal index with (h, w) walking the merged grid.
    Returns ((3, total) positions, (img_start_abs, img_len))."""

    gh, gw = grid_hw
    pos = np.zeros((3, total), np.int32)
    t = 0
    img_start_abs, img_len = offset, 0
    i = 0
    n = len(row)
    while i < n:
        tok = row[i]
        if tok == image_pad_id:
            # count the run
            j = i
            while j < n and row[j] == image_pad_id:
                j += 1
            run = j - i
            img_start_abs = offset + i
            img_len = run
            for k in range(run):
                hh, ww = divmod(k, max(gw, 1))
                pos[0, offset + i + k] = t
                pos[1, offset + i + k] = t + hh
                pos[2, offset + i + k] = t + ww
            t = t + max(gh, gw)
            i = j
        else:
            pos[:, offset + i] = t
            t += 1
            i += 1
    return pos, (img_start_abs, img_len)

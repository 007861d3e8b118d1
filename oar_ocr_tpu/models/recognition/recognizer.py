"""CTC recognizer wrapper: quads → warped tiles → probs → on-device decode.

Counterpart of CRNNModel.forward_refs (oar-ocr-core/src/models/recognition/
crnn.rs:234-258) + OCRResize (resize_recognition.rs:84-157) + CTC decode
(processors/decode.rs:452), restructured TPU-first: the perspective crop,
resize-to-48, pad-to-bucket, normalize, recognizer forward, and greedy CTC
argmax/dedup are ONE jitted program; the host supplies 3×3 matrices and
receives three (B, T) arrays to map through the dictionary.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.constants import REC_IMAGE_SHAPE, REC_MAX_WIDTH
from ...ops.ctc import (CTCLabelDecoder, ctc_greedy_decode, default_charset,
                        pack_ctc_raw, unpack_ctc_raw)
from ...runtime.runtime import Runtime, init_params
from ...utils.tracing import stage_timer
from .svtr import SVTRRecognizer

_LOG = logging.getLogger(__name__)

REC_H = REC_IMAGE_SHAPE[1]  # 48


@dataclass
class CropPlan:
    """One text region scheduled for recognition (two-stage preprocess:
    native-resolution warp then separable resize — matching the
    reference's warpPerspective→resize chain, transform.rs +
    resize_recognition.rs)."""

    page_index: int
    quad: np.ndarray          # (4,2) TL,TR,BR,BL in page coords
    width: int                # resized width at h=48 (post-rotation ratio)
    matrix: np.ndarray        # (3,3) NATIVE crop px → page px
    rotated: bool
    native_w: int             # crop size after rotation
    native_h: int
    flip180: bool = False     # textline-orientation 180° rotation

    def separable(self):
        """(swapped, row_coef, col_coef) when the crop matrix is
        axis-aligned/swapped affine (ops/warp.separable_coefs), else
        None — recomputed on demand since line-orientation may compose a
        180° flip into the matrix after planning."""
        from ...ops.warp import separable_coefs

        return separable_coefs(self.matrix)

    # native sampling caps: crops taller/wider than this are sampled at
    # the cap (bounds worst-case gather volume; typical text is far below)
    MAX_NATIVE_H = 192
    MAX_NATIVE_W = 1920

    @staticmethod
    def from_quad(page_index: int, quad: np.ndarray) -> "CropPlan":
        from ...ops.warp import build_native_crop_matrix, resize_matrix

        mat, rw, rh = build_native_crop_matrix(quad)
        ratio = rw / float(rh) if rh > 0 else 1.0
        width = max(1, min(int(math.ceil(REC_H * ratio)), REC_MAX_WIDTH))
        if rw > CropPlan.MAX_NATIVE_W or rh > CropPlan.MAX_NATIVE_H:
            scale = min(CropPlan.MAX_NATIVE_W / rw, CropPlan.MAX_NATIVE_H / rh)
            nw, nh = max(int(rw * scale), 1), max(int(rh * scale), 1)
            mat = (mat.astype(np.float64)
                   @ resize_matrix(rh, rw, nh, nw).astype(np.float64)
                   ).astype(np.float32)
            rw, rh = nw, nh
        return CropPlan(page_index, np.asarray(quad, np.float32), width,
                        mat, False, rw, rh)

    @property
    def wh_ratio(self) -> float:
        return self.width / float(REC_H)


def _copy_async(arr) -> None:
    """Kick off the device→host transfer early (non-blocking) so the
    ~30 ms-RTT tunnel fetch overlaps later device work; harmless no-op on
    backends without the hook."""
    try:
        arr.copy_to_host_async()
    except (AttributeError, NotImplementedError):
        pass


class CTCRecognizer:
    """Batched text recognition over pre-planned crops."""

    def __init__(
        self,
        params=None,
        *,
        charset: Optional[Sequence[str]] = None,
        use_space_char: bool = True,
        reverse: bool = False,
        backbone_scale: float = 0.95,
        backbone: str = "lcnet",
        runtime: Optional[Runtime] = None,
        seed: int = 0,
    ):
        self.runtime = runtime or Runtime.default()
        self.decoder = CTCLabelDecoder(charset or default_charset(),
                                       use_space_char=use_space_char,
                                       reverse=reverse)
        self.model = SVTRRecognizer(vocab_size=self.decoder.vocab_size,
                                    backbone_scale=backbone_scale,
                                    backbone=backbone)
        if params is None:
            params = init_params(self.model, (1, REC_H, 64, 3))
        self.params = self.runtime.put_params(params)
        # Mesh mode: crop-batch arrays shard over ``data``; params and the
        # (replicated) page store stay replicated, so every per-crop page
        # gather is shard-local (Runtime.shard_jit is a plain jit when no
        # mesh is active).
        self._step = self.runtime.shard_jit(
            self._step_impl, batch_argnums=(2, 3, 4, 5, 6),
            static_argnames=("out_w", "nat_h", "nat_w"))
        self._step_tiles = self.runtime.shard_jit(
            self._step_tiles_impl, batch_argnums=(1, 2, 3, 4),
            static_argnames=("out_w",))
        # Host-warp mode (OAR_TPU_HOST_WARP=1): run the perspective crop
        # as native cv2 WARP_INVERSE_MAP calls on the host and ship tiles
        # — only dense math on the TPU. Measured: the cv2 warps themselves
        # are fast (65 ms / 320 crops) but on a single-core host they
        # serialize against dispatch and drop end-to-end throughput
        # (14 vs 20 pages/s), so the fused on-device warp is the default;
        # on multi-core hosts the host path should win — re-evaluate
        # there (docs/ROADMAP.md).
        import os

        self.host_warp = bool(os.environ.get("OAR_TPU_HOST_WARP"))
        # Separable matmul-only warp for axis-aligned/swapped crops
        # (ops/warp.warp_rec_tiles_separable) — the round-2 fix for the
        # stage-1 HBM gather bottleneck. Kill switch per repo convention.
        self.separable_warp = not os.environ.get("OAR_TPU_NO_SEP_WARP")
        self._step_sep = self.runtime.shard_jit(
            self._step_sep_impl, batch_argnums=(2, 3, 4, 5, 6, 7, 8),
            static_argnames=("out_w", "nat_hb", "nat_wb", "band_h"))
        self._pages_t = None

    def _step_impl(self, params, pages_u8, mats, img_idx, valid_w,
                   native_w, native_h, *, out_w, nat_h, nat_w):
        from ...ops.det_device import separable_resize_normalize
        from ...ops.warp import NormSpec, sample_transform

        # stage 1: perspective warp at NATIVE crop resolution (the
        # reference's warpPerspective, transform.rs:148)
        native = sample_transform(
            pages_u8, mats, img_idx, native_w, native_h,
            out_h=nat_h, out_w=nat_w, norm=NormSpec.identity(),
            out_dtype=jnp.float32)
        # stage 2: separable bilinear resize to (48, w_i) on the MXU with
        # the rec normalization fused (x·2/255 − 1, BGR —
        # normalization.rs:202-210); channel flip implements BGR
        native = native[..., ::-1]
        b = mats.shape[0]
        tiles = separable_resize_normalize(
            native, native_h, native_w,
            jnp.full((b,), REC_H, jnp.int32), valid_w,
            jnp.full((3,), 2.0 / 255.0, jnp.float32),
            jnp.full((3,), -1.0, jnp.float32),
            out_h=REC_H, out_w=out_w,
            out_dtype=self.runtime.compute_dtype,
            pad_value=-1.0)    # black-pixel pad through x·2/255−1
        probs = self.model.apply(params, tiles)
        return pack_ctc_raw(ctc_greedy_decode(probs))

    def _step_tiles_impl(self, params, tiles_u8, native_w, native_h,
                         valid_w, *, out_w):
        """Device half of the host-warp path: tiles are already native-res
        crops; resize+normalize on the MXU, then model + CTC."""
        from ...ops.det_device import separable_resize_normalize

        native = tiles_u8[..., ::-1].astype(jnp.float32)   # BGR
        b = tiles_u8.shape[0]
        tiles = separable_resize_normalize(
            native, native_h, native_w,
            jnp.full((b,), REC_H, jnp.int32), valid_w,
            jnp.full((3,), 2.0 / 255.0, jnp.float32),
            jnp.full((3,), -1.0, jnp.float32),
            out_h=REC_H, out_w=out_w,
            out_dtype=self.runtime.compute_dtype,
            pad_value=-1.0)
        probs = self.model.apply(params, tiles)
        return pack_ctc_raw(ctc_greedy_decode(probs))

    def _step_sep_impl(self, params, src_pages, row_c, col_c,
                       img_idx, band_y0, nat_h, nat_w, valid_w,
                       *, out_w, nat_hb, nat_wb, band_h):
        from ...ops.warp import NormSpec, warp_rec_tiles_separable

        tiles = warp_rec_tiles_separable(
            src_pages, row_c, col_c, img_idx, band_y0,
            nat_h, nat_w, valid_w, out_h=REC_H, out_w=out_w,
            nat_h_bucket=nat_hb, nat_w_bucket=nat_wb, band_h=band_h,
            norm=NormSpec.rec_bgr(), out_dtype=self.runtime.compute_dtype)
        probs = self.model.apply(params, tiles)
        return pack_ctc_raw(ctc_greedy_decode(probs))

    def _pages_transposed(self, pages_u8):
        cached = self._pages_t
        if cached is not None and cached[0] is pages_u8:
            return cached[1]
        pt = jnp.transpose(pages_u8, (0, 2, 1, 3))
        self._pages_t = (pages_u8, pt)
        return pt

    def _dispatch_separable(self, pages_u8, plans: Sequence[CropPlan],
                            coefs, *, swapped_group: bool):
        from ...ops.warp import band_origin

        cfg = self.runtime.cfg
        src = (self._pages_transposed(pages_u8) if swapped_group
               else pages_u8)
        src_h = src.shape[1]
        n = len(plans)
        nb = self.runtime.round_batch(cfg.rec_batch_buckets.bucket(n))
        out_w = cfg.rec_width_buckets.bucket(max(p.width for p in plans))
        nat_hb = cfg.rec_native_h_buckets.bucket(
            max(p.native_h for p in plans))
        nat_wb = cfg.rec_native_w_buckets.bucket(
            max(p.native_w for p in plans))
        # row-band size: the largest page-row span any crop samples
        # (|row_a|·(nat_h−1) + bilinear margin); dispatch_chunk routed
        # larger-span crops to the gather path
        band_h = cfg.rec_native_h_buckets.bucket(int(max(
            abs(rc[0]) * (min(p.native_h, nat_hb) - 1) + 4
            for p, (_, rc, _) in zip(plans, coefs))))

        row_c = np.zeros((nb, 2), np.float32)
        col_c = np.zeros((nb, 2), np.float32)
        row_c[:, 0] = col_c[:, 0] = 1.0
        img_idx = np.zeros((nb,), np.int32)
        band_y0 = np.zeros((nb,), np.int32)
        valid_w = np.zeros((nb,), np.int32)
        nat_h = np.ones((nb,), np.int32)
        nat_w = np.ones((nb,), np.int32)
        for i, (p, (_sw, rc, cc)) in enumerate(zip(plans, coefs)):
            row_c[i] = rc
            col_c[i] = cc
            img_idx[i] = p.page_index
            band_y0[i] = band_origin(rc, min(p.native_h, nat_hb),
                                     src_h, band_h)
            valid_w[i] = min(p.width, out_w)
            nat_h[i] = min(p.native_h, nat_hb)
            nat_w[i] = min(p.native_w, nat_wb)

        with stage_timer("rec.dispatch_sep", batch=nb, width=out_w,
                         native=(nat_hb, nat_wb)):
            return self._step_sep(
                self.params, src,
                jnp.asarray(row_c), jnp.asarray(col_c),
                jnp.asarray(img_idx), jnp.asarray(band_y0),
                jnp.asarray(nat_h), jnp.asarray(nat_w),
                jnp.asarray(valid_w),
                out_w=out_w, nat_hb=nat_hb, nat_wb=nat_wb, band_h=band_h)

    def _dispatch_host_warp(self, host_images, plans: Sequence[CropPlan]):
        import cv2

        cfg = self.runtime.cfg
        n = len(plans)
        nb = self.runtime.round_batch(cfg.rec_batch_buckets.bucket(n))
        out_w = cfg.rec_width_buckets.bucket(max(p.width for p in plans))
        nat_h = cfg.rec_native_h_buckets.bucket(max(p.native_h for p in plans))
        nat_w = cfg.rec_native_w_buckets.bucket(max(p.native_w for p in plans))

        tiles = np.zeros((nb, nat_h, nat_w, 3), np.uint8)
        valid_w = np.zeros((nb,), np.int32)
        native_w = np.ones((nb,), np.int32)
        native_h = np.ones((nb,), np.int32)
        with stage_timer("rec.host_warp", batch=n):
            for i, p in enumerate(plans):
                nw = min(p.native_w, nat_w)
                nh = min(p.native_h, nat_h)
                # plan.matrix maps native px → page px (incl. rotation,
                # caps, textline 180°); WARP_INVERSE_MAP consumes exactly
                # that map — identical sampling to the device path
                cv2.warpPerspective(
                    host_images[p.page_index], p.matrix, (nat_w, nat_h),
                    dst=tiles[i], flags=cv2.INTER_LINEAR
                    | cv2.WARP_INVERSE_MAP,
                    borderMode=cv2.BORDER_CONSTANT)
                if nw < nat_w:
                    tiles[i, :, nw:] = 0
                if nh < nat_h:
                    tiles[i, nh:] = 0
                valid_w[i] = min(p.width, out_w)
                native_w[i] = nw
                native_h[i] = nh
        with stage_timer("rec.dispatch", batch=nb, width=out_w,
                         native=(nat_h, nat_w)):
            return self._step_tiles(
                self.params, jnp.asarray(tiles), jnp.asarray(native_w),
                jnp.asarray(native_h), jnp.asarray(valid_w), out_w=out_w)

    def dispatch_chunk(self, pages_u8: jax.Array,
                       plans: Sequence[CropPlan],
                       host_images=None, start_copy: bool = True):
        """Launch one ratio-sorted chunk. Returns a composite handle:
        a list of (positions-within-chunk, device handle) sub-batches —
        separable crops ride the matmul-only warp, slanted crops the
        gather warp. ``start_copy=False`` defers the d2h copies so the
        caller can merge several chunks into one fetch
        (:meth:`merge_dispatched`)."""

        if host_images is not None and self.host_warp:
            h = self._dispatch_host_warp(host_images, plans)
            if start_copy:
                _copy_async(h)
            return [(list(range(len(plans))), h)]
        if not self.separable_warp:
            h = self._dispatch_device_warp(pages_u8, plans)
            if start_copy:
                _copy_async(h)
            return [(list(range(len(plans))), h)]
        max_band = self.runtime.cfg.rec_native_h_buckets.sizes[-1]
        groups = {"direct": ([], [], []), "swapped": ([], [], [])}
        gat_pos, gat_plans = [], []
        for i, p in enumerate(plans):
            got = p.separable()
            if got is not None:
                span = abs(got[1][0]) * (p.native_h - 1) + 4
                if span > max_band:
                    got = None
            if got is not None:
                key = "swapped" if got[0] else "direct"
                groups[key][0].append(i)
                groups[key][1].append(p)
                groups[key][2].append(got)
            else:
                gat_pos.append(i)
                gat_plans.append(p)
        out = []
        for key, (pos, ps, coefs) in groups.items():
            if ps:
                out.append((pos, self._dispatch_separable(
                    pages_u8, ps, coefs, swapped_group=key == "swapped")))
        if gat_plans:
            out.append((gat_pos, self._dispatch_device_warp(
                pages_u8, gat_plans)))
        # start the d2h copies now so the (slow-RTT) transfers overlap the
        # device compute of later chunks instead of serializing in collect
        if start_copy:
            for _, packed in out:
                _copy_async(packed)
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def _kept_budgets(t: int):
        """Kept-count budgets for the kept-only CTC transfer, smallest
        first; capped at t//2 (beyond that the payload stops paying)."""
        fixed = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256)
        return tuple(sorted({b for b in fixed if b < t // 2} | {t // 2}))

    def _note_kept_kmax(self, t: int, kmax: int):
        """Kept-count history per timestep bucket: rises instantly,
        decays 10%/merge (same discipline as the det tile predictor)."""
        hist = getattr(self, "_kept_hist", None)
        if hist is None:
            hist = self._kept_hist = {}
        prev = hist.get(t)
        hist[t] = kmax if prev is None else max(kmax, int(prev * 0.9))

    def _kept_budget(self, t: int) -> Optional[int]:
        """Smallest budget covering recent kept counts ×1.3 headroom;
        t//2 when there is no history yet; None when history says the
        rows are too dense for any budget to pay (e.g. untrained
        weights) — the sub-batch then rides the full transfer, and the
        history keeps decaying from the full fetches so sparse content
        re-enables the kept path."""
        prev = getattr(self, "_kept_hist", {}).get(t)
        if prev is None:
            return max(1, t // 2)
        need = int(prev * 1.3) + 2
        return next((b for b in self._kept_budgets(t) if need <= b), None)

    def merge_dispatched(self, pending):
        """Fold every sub-batch of several dispatched chunks into ONE
        device array and start its single d2h copy.

        ``pending`` is a list of ``(tag, plans, handle)`` where ``handle``
        came from :meth:`dispatch_chunk` (with ``start_copy=False``).
        The axon tunnel charges a fixed ~30-50 ms RTT per fetch
        (docs/environment-variables.md), so one predict-batch's rec
        results must cross the link as one transfer. Full mode: sub-
        batches are sliced to their live rows, right-padded to the widest
        timestep count (pad idx = −1 ⇒ keep=False) and concatenated on
        device. Kept mode (``Runtime.rec_kept_active`` — degraded d2h
        links): each sub-batch is first reduced on device to only its
        KEPT timesteps at a speculatively budgeted width
        (ops/ctc.gather_kept_ctc; the decoder reads nothing else), with a
        per-sub full refetch when a budget guess overflows. Returns an
        opaque handle for :meth:`collect_merged`."""

        arrs = parts = None
        if self.runtime.rec_kept_active():
            try:
                arrs, parts = self._merge_kept(pending)
            except Exception as e:  # pragma: no cover - tunnel flake
                # a transient remote-compile failure on a first-seen
                # kept budget must not kill the predict — the full
                # merge is always valid
                self.runtime.note_degrade("kept_rec_merge")
                _LOG.warning(
                    "kept-CTC merge failed (%s); full transfer", e)
                arrs = parts = None
        if parts is None:
            arrs, parts = self._merge_full(pending)
        if not arrs:
            return None, parts
        merged = arrs[0] if len(arrs) == 1 else jnp.concatenate(arrs, 0)
        _copy_async(merged)
        fut = self.runtime.io_submit(self._fetch_merged, merged)
        return fut, parts

    def _merge_kept(self, pending):
        """Kept-mode half of :meth:`merge_dispatched`: reduce each
        sub-batch on device to only its KEPT timesteps at a budgeted
        width (2-D payload)."""
        from ...ops.ctc import gather_kept_ctc

        parts, arrs = [], []
        row = 0
        wmax = 0
        gathered = []
        for tag, plans, handle in pending:
            subs = []
            for positions, packed in handle:
                n = len(positions)
                t = packed.shape[1]
                k = self._kept_budget(t)
                if k is None:
                    # history says too dense → full transfer for
                    # this sub-batch, flattened to ride the same
                    # merged 2-D fetch
                    g = packed[:n].reshape(n, 6 * t)
                    subs.append((positions, row, n, t))
                else:
                    g = gather_kept_ctc(packed, k=k)[:n]
                    # keep the full packed array alive for the
                    # (rare) overflow refetch
                    subs.append((positions, row, n, t, k, packed))
                gathered.append(g)
                wmax = max(wmax, g.shape[1])
                row += n
            parts.append((tag, plans, subs))
        for g in gathered:
            if g.shape[1] < wmax:
                g = jnp.pad(g, ((0, 0), (0, wmax - g.shape[1])))
            arrs.append(g)
        return arrs, parts

    def _merge_full(self, pending):
        """Full-mode half of :meth:`merge_dispatched`: every sub-batch
        right-padded to the widest timestep count (3-D payload)."""
        parts, arrs = [], []
        row = 0
        tmax = 0
        for _tag, _plans, handle in pending:
            for _pos, packed in handle:
                tmax = max(tmax, packed.shape[1])
        for tag, plans, handle in pending:
            subs = []
            for positions, packed in handle:
                n = len(positions)
                a = packed[:n]
                if a.shape[1] < tmax:
                    # 0xFF bytes ⇒ int16 idx −1 ⇒ keep False
                    # (pack_ctc_raw)
                    a = jnp.pad(
                        a, ((0, 0), (0, tmax - a.shape[1]), (0, 0)),
                        constant_values=255)
                arrs.append(a)
                subs.append((positions, row, n, packed.shape[1]))
                row += n
            parts.append((tag, plans, subs))
        return arrs, parts

    def _fetch_merged(self, merged) -> np.ndarray:
        """Link-thread fetch of one merged rec transfer; feeds the d2h
        bandwidth EMA (the packed CTC array is one of the two sizable
        per-iteration d2h payloads, next to the det bitmap)."""
        import time as _time

        with stage_timer("rec.device", rows=int(merged.shape[0])):
            t0 = _time.perf_counter()
            packed_np = np.asarray(merged)
            self.runtime.note_d2h(packed_np.nbytes,
                                  _time.perf_counter() - t0)
        return packed_np

    def collect_merged(self, merged_handle):
        """Join one merged transfer (in flight on the link thread) and
        dictionary-decode every chunk in it. Yields ``(tag, plans,
        decoded)`` with ``decoded`` aligned to ``plans`` order. Kept-mode
        subs (6-tuples) parse the kept-only payload and refetch the full
        packed array when their budget overflowed."""

        fut, parts = merged_handle
        if fut is None:
            return []
        with stage_timer("rec.wait"):
            packed_np = fut.result()
        out = []
        for tag, plans, subs in parts:
            results: List = [None] * len(plans)
            with stage_timer("rec.decode", batch=len(plans)):
                for sub_t in subs:
                    if len(sub_t) == 6:          # kept-only payload
                        positions, row, n, t, k, packed_dev = sub_t
                        raw = self._parse_kept(
                            packed_np[row : row + n], n, t, k, packed_dev)
                    elif packed_np.ndim == 2:    # kept-mode full sub
                        positions, row, n, t = sub_t
                        raw = unpack_ctc_raw(
                            packed_np[row : row + n, : 6 * t]
                            .reshape(n, t, 6))
                        # keep decaying the history so sparse content
                        # re-enables the kept path for this width
                        self._note_kept_kmax(
                            t, int(raw[2].sum(axis=1).max()) if n else 0)
                    else:
                        positions, row, n, t = sub_t
                        raw = unpack_ctc_raw(packed_np[row : row + n, :t])
                    decoded = self.decoder.decode_with_positions(raw)
                    for pos, d in zip(positions, decoded):
                        results[pos] = d
            out.append((tag, plans, results))
        return out

    def _parse_kept(self, payload: np.ndarray, n: int, t: int, k: int,
                    packed_dev):
        """Unpack one kept-only sub-batch; on budget overflow refetch the
        full packed array (one extra RTT — the history then rises so the
        next merge budgets wider)."""
        from ...ops.ctc import unpack_kept_ctc

        payload = payload[:, : 4 + 8 * k]
        counts = payload[:, :4].copy().view(np.int32)[:, 0]
        self._note_kept_kmax(t, int(counts.max()) if n else 0)
        raw = unpack_kept_ctc(payload, k, t)
        if raw is not None:
            return raw
        import time as _time

        self.runtime.note_overflow("kept_rec")
        with stage_timer("rec.kept_overflow", batch=n, t=t, k=k):
            t0 = _time.perf_counter()
            full = np.asarray(packed_dev)
            self.runtime.note_d2h(full.nbytes, _time.perf_counter() - t0)
        return unpack_ctc_raw(full[:n])

    def _dispatch_device_warp(self, pages_u8: jax.Array,
                              plans: Sequence[CropPlan]):
        """Launch one ratio-sorted chunk asynchronously; returns a handle
        of device arrays. Dispatching every chunk before collecting any
        keeps the device busy while the host decodes earlier chunks (the
        TPU analog of the reference's session-pool overlap)."""

        cfg = self.runtime.cfg
        n = len(plans)
        nb = self.runtime.round_batch(cfg.rec_batch_buckets.bucket(n))
        out_w = cfg.rec_width_buckets.bucket(max(p.width for p in plans))
        nat_h = cfg.rec_native_h_buckets.bucket(max(p.native_h for p in plans))
        nat_w = cfg.rec_native_w_buckets.bucket(max(p.native_w for p in plans))

        mats = np.zeros((nb, 3, 3), np.float32)
        mats[:, 0, 0] = mats[:, 1, 1] = mats[:, 2, 2] = 1.0
        img_idx = np.zeros((nb,), np.int32)
        valid_w = np.zeros((nb,), np.int32)
        native_w = np.ones((nb,), np.int32)
        native_h = np.ones((nb,), np.int32)
        for i, p in enumerate(plans):
            mats[i] = p.matrix
            img_idx[i] = p.page_index
            valid_w[i] = min(p.width, out_w)
            native_w[i] = min(p.native_w, nat_w)
            native_h[i] = min(p.native_h, nat_h)

        with stage_timer("rec.dispatch", batch=nb, width=out_w,
                         native=(nat_h, nat_w)):
            return self._step(
                self.params, pages_u8, jnp.asarray(mats),
                jnp.asarray(img_idx), jnp.asarray(valid_w),
                jnp.asarray(native_w), jnp.asarray(native_h),
                out_w=out_w, nat_h=nat_h, nat_w=nat_w)

    def collect_chunk(self, handle, plans: Sequence[CropPlan]
                      ) -> List[Tuple[str, float, List[int]]]:
        """Fetch + dictionary-decode one dispatched chunk (composite
        handle: sub-batches merge back into plan order)."""
        results: List = [None] * len(plans)
        for positions, packed in handle:
            n = len(positions)
            with stage_timer("rec.device", batch=n):
                idx, prob, keep = unpack_ctc_raw(np.asarray(packed))
            with stage_timer("rec.decode", batch=n):
                decoded = self.decoder.decode_with_positions(
                    (idx[:n], prob[:n], keep[:n]))
            for pos, d in zip(positions, decoded):
                results[pos] = d
        return results

    def recognize_chunk(
        self, pages_u8: jax.Array, plans: Sequence[CropPlan],
        host_images=None,
    ) -> List[Tuple[str, float, List[int]]]:
        """Run one ratio-sorted chunk. Returns (text, confidence, kept
        column indices) per plan, in plan order."""

        if not plans:
            return []
        return self.collect_chunk(
            self.dispatch_chunk(pages_u8, plans, host_images=host_images),
            plans)

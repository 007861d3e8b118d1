"""DB detector wrapper: plan (host) → one XLA program (device) → geometry (host).

Counterpart of the reference's DBModel.forward (oar-ocr-core/src/models/
detection/db.rs:281 — preprocess → OrtInfer → DBPostProcess) re-split for
TPU, engineered around the measured link asymmetry (device→host is the
bottleneck — SURVEY §7 "ship bitmasks, not f32 maps"):

- preprocess: per-image resize+normalize as interpolation **matmuls** on
  the MXU (ops/det_device.separable_resize_normalize) — detection resizes
  are axis-aligned, no gather needed;
- forward + threshold (+optional dilation) + **bit-packing** in the same
  jitted program: the host receives 1 bit/pixel;
- probability maps stay resident on device; per-candidate box scores
  (box_score_fast, db_score.rs:34) are computed there too
  (ops/det_device.quad_scores) — only (K,) floats cross the link;
- contour geometry / unclip on host (processors/db_postprocess.py).

The polygon path (seal text) still fetches the f32 map: its scores run on
arbitrary simplified contours which the convex-quad device scorer cannot
represent; seal pages are small so the transfer is acceptable. ScoreMode
SLOW likewise uses the host path for exact contour scoring.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config.runtime import BucketTable
from ...core.types import BoxType, ScoreMode
from ...ops.det_device import (pack_bits, quad_scores,
                               separable_resize_normalize)
from ...ops.resize import DetResizeConfig, det_target_size
from ...processors.db_postprocess import DBPostProcess, DBPostProcessConfig
from ...runtime.runtime import Runtime, init_params, stack_padded
from ...utils.tracing import stage_timer
from .db import DBNet

import logging

_LOG = logging.getLogger(__name__)

# candidate-count buckets for the device scoring call
SCORE_BUCKETS = BucketTable((32, 128, 512))
_SCORE_CHUNK = 8


@dataclass
class DetPlan:
    """Host-computed plan for one image in a detection batch."""

    src_h: int
    src_w: int
    dst_h: int
    dst_w: int


class DBDetector:
    """Batched DB text detection over uint8 page images."""

    def __init__(
        self,
        params=None,
        *,
        resize_cfg: DetResizeConfig = DetResizeConfig(),
        post_cfg: DBPostProcessConfig = DBPostProcessConfig(),
        backbone_scale: float = 0.75,
        backbone: str = "lcnet",
        runtime: Optional[Runtime] = None,
        seed: int = 0,
    ):
        self.runtime = runtime or Runtime.default()
        self.resize_cfg = resize_cfg
        self.postprocess = DBPostProcess(post_cfg)
        self.model = DBNet(backbone_scale=backbone_scale, backbone=backbone)
        if params is None:
            params = init_params(self.model, (1, 64, 64, 3))
        self.params = self.runtime.put_params(params)
        # Mesh mode (SURVEY §2.7): page batch + per-image plan arrays
        # shard over ``data``; params/threshold replicate. The prob map
        # comes back REPLICATED (one all-gather inside the program) so
        # the candidate-scoring call — a fori_loop over candidate
        # chunks, partition-hostile — stays a replicated computation;
        # the bit-packed bitmap stays sharded. (Plain jit off-mesh.)
        self._step = self.runtime.shard_jit(
            self._step_impl, batch_argnums=(1, 2, 3, 4, 5),
            static_argnames=("out_h", "out_w", "dilate"),
            out_spec=("replicated", "data"))
        self._scores = jax.jit(
            functools.partial(quad_scores, chunk=_SCORE_CHUNK))
        # consecutive sparse-path failure escalation (ADVICE r4): one-off
        # tunnel flakes degrade per-batch with a warning; N in a row means
        # the sparse path itself is broken → error-level log + session
        # disable, so a real regression doesn't hide as degraded
        # throughput behind per-batch warnings.
        self._sparse_fail_streak = 0
        self._sparse_disabled = False

    SPARSE_FAIL_DISABLE_AFTER = 5

    def _note_sparse_failure(self, where: str, exc: Exception) -> None:
        self.runtime.note_degrade(f"sparse_det_{where}")
        self._sparse_fail_streak = getattr(
            self, "_sparse_fail_streak", 0) + 1
        if self._sparse_fail_streak >= self.SPARSE_FAIL_DISABLE_AFTER:
            self._sparse_disabled = True
            _LOG.error(
                "sparse det %s failed %d consecutive times (%s); "
                "disabling the sparse det fetch for this session — "
                "this looks like a persistent regression, not a "
                "transient tunnel flake", where,
                self._sparse_fail_streak, exc)
        else:
            _LOG.warning("sparse det %s failed (%s); full transfer",
                         where, exc)

    def _step_impl(self, params, pages_u8, src_h, src_w, dst_h, dst_w,
                   thresh, *, out_h: int, out_w: int, dilate: bool):
        from ...core.constants import IMAGENET_MEAN, IMAGENET_STD

        alpha = jnp.asarray(
            [1.0 / (255.0 * s) for s in IMAGENET_STD], jnp.float32)
        beta = jnp.asarray(
            [-m / s for m, s in zip(IMAGENET_MEAN, IMAGENET_STD)], jnp.float32)
        x = separable_resize_normalize(
            pages_u8, src_h, src_w, dst_h, dst_w, alpha, beta,
            out_h=out_h, out_w=out_w,
            out_dtype=self.runtime.compute_dtype)
        prob = self.model.apply(params, x).astype(jnp.float32)
        bitmap = prob > thresh
        if dilate:
            # 2×2 structuring-element dilation (db_postprocess.rs dilation)
            bitmap = jax.lax.reduce_window(
                bitmap, False, jax.lax.bitwise_or, (1, 2, 2), (1, 1, 1),
                [(0, 0), (0, 1), (0, 1)])
        return prob, pack_bits(bitmap)

    def plan(self, shapes: Sequence[Tuple[int, int]]) -> List[DetPlan]:
        """Compute per-image det resize targets (exact reference math)."""
        return [
            DetPlan(h, w, *det_target_size(h, w, self.resize_cfg))
            for (h, w) in shapes
        ]

    # ------------------------------------------------------------------
    def dispatch(
        self,
        pages_u8: jax.Array,
        shapes: Sequence[Tuple[int, int]],
        page_indices: Optional[Sequence[int]] = None,
    ):
        """Launch the device half asynchronously; returns a handle for
        `collect`. Dispatching several batches before collecting any
        overlaps host geometry with device compute."""

        plans = self.plan(shapes)
        cfg = self.runtime.cfg
        n = len(plans)
        out_h = cfg.det_side_buckets.bucket(max(p.dst_h for p in plans))
        out_w = cfg.det_side_buckets.bucket(max(p.dst_w for p in plans))
        nb = self.runtime.round_batch(cfg.det_batch_buckets.bucket(n))

        # gather the requested pages into a contiguous device batch of the
        # bucketed size (cheap on-device copy; pads repeat page 0)
        src_idx = list(page_indices) if page_indices is not None else list(range(n))
        idx = src_idx + [src_idx[0]] * (nb - n)
        if idx == list(range(pages_u8.shape[0])):
            batch = pages_u8
        else:
            batch = pages_u8[jnp.asarray(idx, jnp.int32)]
        if self.runtime.mesh is not None:
            # page store is replicated; the det batch computes sharded —
            # explicit reshard (a local slice per device) since committed
            # arrays don't auto-reshard at the jit boundary
            batch = jax.device_put(batch, self.runtime.data_sharding())

        src_h = np.array([p.src_h for p in plans] + [1] * (nb - n), np.int32)
        src_w = np.array([p.src_w for p in plans] + [1] * (nb - n), np.int32)
        dst_h = np.array([p.dst_h for p in plans] + [1] * (nb - n), np.int32)
        dst_w = np.array([p.dst_w for p in plans] + [1] * (nb - n), np.int32)

        pp_cfg = self.postprocess.cfg
        with stage_timer("det.dispatch", batch=nb, hw=(out_h, out_w)):
            prob_dev, packed = self._step(
                self.params, batch, jnp.asarray(src_h), jnp.asarray(src_w),
                jnp.asarray(dst_h), jnp.asarray(dst_w),
                jnp.float32(pp_cfg.thresh),
                out_h=out_h, out_w=out_w, dilate=pp_cfg.use_dilation)
        # Sparse fetch decision happens at dispatch so the async copy
        # targets the payload we will actually read: on a degraded d2h
        # link (runtime.det_sparse_active, EMA-gated) ship only the tiny
        # per-row occupancy mask now and gather occupied rows at collect;
        # otherwise start the full ~1 MB bit-packed transfer so it rides
        # the tunnel while the next batch computes.
        sparse = (not getattr(self, "_sparse_disabled", False)
                  and self.runtime.det_sparse_active()
                  and pp_cfg.box_type != BoxType.POLY
                  and pp_cfg.score_mode != ScoreMode.SLOW)
        mask = None
        mode = None
        if sparse:
            try:
                from ...ops.det_device import (
                    DET_TILE_H, DET_TILE_W8, det_tileable,
                    gather_occupied_tiles_packed, row_occupancy_mask,
                    tile_occupancy_mask)

                if det_tileable(packed.shape[1], packed.shape[2]):
                    nt = ((packed.shape[1] // DET_TILE_H)
                          * (packed.shape[2] // DET_TILE_W8))
                    k = self._predict_tile_budget(nt)
                    if k is not None:
                        # speculative budget from recent occupancy
                        # history: ONE d2h round-trip (count+idx+tiles
                        # in one payload) instead of the mask-first
                        # path's three
                        mode, mask = ("tile_spec",
                                      gather_occupied_tiles_packed(
                                          packed, k=k))
                    else:
                        mode, mask = "tile", tile_occupancy_mask(packed)
                else:
                    mode, mask = "row", row_occupancy_mask(packed)
            except Exception as e:  # pragma: no cover - tunnel flake
                # a transient remote-compile failure on a first-seen
                # budget shape must not kill the predict — the full
                # transfer is always valid
                self._note_sparse_failure("dispatch", e)
                sparse, mode, mask = False, None, None
        target = mask if sparse else packed
        try:
            target.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        # hand the blocking fetch to the link thread: the tunnel wait
        # (GIL-released) overlaps the caller's next upload / host work
        fetch_fut = self.runtime.io_submit(
            self._fetch_bitmap_timed, packed, mask, mode)
        return (plans, prob_dev, packed, out_w, fetch_fut)

    def detect(
        self,
        pages_u8: jax.Array,                 # (P, H, W, 3) uint8 on device
        shapes: Sequence[Tuple[int, int]],   # original (h, w) per page
        page_indices: Optional[Sequence[int]] = None,
    ) -> List[Tuple[List[np.ndarray], List[float]]]:
        """Detect text boxes on each page. Returns [(boxes, scores)] per
        page in original-image coordinates."""

        return self.collect(self.dispatch(pages_u8, shapes, page_indices))

    def collect(self, handle) -> List[Tuple[List[np.ndarray], List[float]]]:
        return self.finalize(self.collect_candidates(handle))

    @staticmethod
    def _sparse_budgets(out_h: int):
        """Occupied-row budgets, smallest first; beyond 3/4 the sparse
        fetch stops paying for its extra round-trip → full fallback."""
        return (out_h // 8, out_h // 4, out_h // 2, 3 * out_h // 4)

    def _fetch_bitmap_timed(self, packed, mask, mode) -> np.ndarray:
        """Link-thread entry: the full fetch duration lands in the
        ``det.device`` metric; the main thread's residual wait is
        ``det.wait`` (collect_candidates)."""
        with stage_timer("det.device", batch=int(packed.shape[0])):
            return self._fetch_bitmap(packed, mask, mode)

    @staticmethod
    def _tile_budgets(nt: int):
        """Occupied-tile budgets, smallest first; beyond 1/2 the 2-D
        sparse fetch stops paying for its extra round-trip."""
        import math

        fr = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 3 / 8, 1 / 2)
        return tuple(sorted({max(1, math.ceil(nt * f)) for f in fr}))

    # --- speculative tile-budget predictor (per bitmap tile count) ---
    def _note_tile_kmax(self, nt: int, kmax: int):
        """Track recent max occupied-tile counts: rises instantly (an
        overflow must widen the next guess immediately), decays 10% per
        batch so a one-off dense page doesn't pin the budget high."""
        hist = getattr(self, "_tile_kmax", None)
        if hist is None:
            hist = self._tile_kmax = {}
        prev = hist.get(nt)
        hist[nt] = kmax if prev is None else max(kmax, int(prev * 0.9))

    def _predict_tile_budget(self, nt: int):
        """Smallest tile budget covering recent occupancy ×1.3 headroom;
        None when there is no history yet (first sparse batch of this
        shape → mask-first path, which seeds the history) or the page is
        too dense for any budget to pay."""
        prev = getattr(self, "_tile_kmax", {}).get(nt)
        if prev is None:
            return None
        need = int(prev * 1.3) + 4
        return next((bud for bud in self._tile_budgets(nt)
                     if need <= bud), None)

    def _fetch_bitmap(self, packed, mask, mode) -> np.ndarray:
        """Bring the bit-packed bitmap to host. With ``mask`` set (sparse
        mode, dispatch decided): ``mode="tile_spec"`` reads ONE
        speculatively sized payload (count+idx+tiles — a single tunnel
        RTT; budget from the occupancy history, full-fetch fallback on
        overflow); ``mode="tile"`` reads the tiny occupancy mask first
        and gathers occupied 16×32-px tiles at the smallest sufficient
        budget (three RTTs — the first sparse batch of a shape, seeding
        the history); ``mode="row"`` is the per-row fallback for
        non-tileable shapes. All reassemble bit-identically to the full
        fetch (gather_occupied_* invariant). Dense batches fall back to
        the full transfer. Every fetch feeds the runtime's d2h
        bandwidth/RTT EMAs so the auto policy adapts as the link
        changes."""
        import time as _time

        rt = self.runtime
        if mask is not None:
            # STARVATION-GATED periodic full transfer: sparse payloads
            # can sit under note_d2h's 64 KB floor, freezing the EMA and
            # latching sparse after the link recovers. Only when no
            # measurement has landed within link_recovery_interval_s
            # does ONE full fetch re-measure (the full transfer below is
            # ≥64 KB, so it resets the clock via note_d2h). Payloads
            # above the floor keep the EMA live for free — no probe.
            if (rt.cfg.det_sparse_fetch == "auto"
                    and rt.d2h_recovery_due()):
                rt.note_recovery("det_full")
                rt.note_d2h_probe()     # small bitmaps can be under the
                mask = None             # 64 KB measurement floor
        if mask is not None:
            # any failure inside a budgeted gather (typically a
            # transient remote-compile tunnel drop on a first-seen
            # budget shape) degrades to the always-valid full transfer
            # below instead of killing the predict
            try:
                out = self._fetch_bitmap_sparse(packed, mask, mode)
                if out is not None:
                    self._sparse_fail_streak = 0
                    return out
            except Exception as e:  # pragma: no cover - tunnel flake
                self._note_sparse_failure(f"fetch[{mode}]", e)
        t0 = _time.perf_counter()
        packed_np = np.asarray(packed)
        rt.note_d2h(packed_np.nbytes, _time.perf_counter() - t0)
        return packed_np

    def _fetch_bitmap_sparse(self, packed, mask, mode):
        """The three sparse reassembly paths of :meth:`_fetch_bitmap`;
        returns ``None`` when the budget guess doesn't pay (dense page /
        overflow) so the caller runs the full transfer."""
        import time as _time

        rt = self.runtime
        if mode == "tile_spec":
            # speculative one-fetch payload (count+idx+tiles packed by
            # gather_occupied_tiles_packed): unpack, or fall through to
            # the full transfer when the budget guess overflowed
            from ...ops.det_device import DET_TILE_H, DET_TILE_W8

            b, out_h, w8 = packed.shape
            nth, ntw = out_h // DET_TILE_H, w8 // DET_TILE_W8
            nt = nth * ntw
            tile_b = DET_TILE_H * DET_TILE_W8
            t0 = _time.perf_counter()
            arr = np.asarray(mask)            # (nb, 4 + k·(4+tile_b))
            rt.note_d2h(arr.nbytes, _time.perf_counter() - t0)
            k = (arr.shape[1] - 4) // (4 + tile_b)
            counts = arr[:, :4].copy().view(np.int32)[:, 0]
            kmax = int(counts.max())
            self._note_tile_kmax(nt, kmax)
            if kmax <= k:
                idx = arr[:, 4:4 + 4 * k].copy().view(
                    np.int32).reshape(b, k)
                tiles = arr[:, 4 + 4 * k:].reshape(b, k, tile_b)
                out_t = np.zeros((b, nt, tile_b), np.uint8)
                np.put_along_axis(out_t, idx[:, :, None], tiles, axis=1)
                return (out_t.reshape(b, nth, ntw, DET_TILE_H, DET_TILE_W8)
                        .transpose(0, 1, 3, 2, 4).reshape(packed.shape))
            # expected speculative-budget miss (dense batch / workload
            # shift): the history just rose, so the next guess widens
            rt.note_overflow("det_tile_spec")
        elif mode == "tile":
            from ...ops.det_device import (DET_TILE_H, DET_TILE_W8,
                                           gather_occupied_tiles)

            t0 = _time.perf_counter()
            mask_np = np.asarray(mask)               # (nb, ceil(nt/8))
            rt.note_rtt(_time.perf_counter() - t0)
            b, out_h, w8 = packed.shape
            nth, ntw = out_h // DET_TILE_H, w8 // DET_TILE_W8
            nt = nth * ntw
            bits = np.unpackbits(mask_np, axis=-1, count=nt)
            kmax = int(bits.sum(axis=1).max())
            self._note_tile_kmax(nt, kmax)
            k = next((bud for bud in self._tile_budgets(nt)
                      if kmax <= bud), None)
            if k is not None and 0 < k < nt:
                tiles_dev, idx_dev = gather_occupied_tiles(packed, k=k)
                t0 = _time.perf_counter()
                tiles = np.asarray(tiles_dev)
                idx = np.asarray(idx_dev)
                rt.note_d2h(tiles.nbytes, _time.perf_counter() - t0)
                out_t = np.zeros((b, nt, DET_TILE_H * DET_TILE_W8),
                                 np.uint8)
                np.put_along_axis(out_t, idx[:, :, None], tiles, axis=1)
                return (out_t.reshape(b, nth, ntw, DET_TILE_H, DET_TILE_W8)
                        .transpose(0, 1, 3, 2, 4).reshape(packed.shape))
        else:
            t0 = _time.perf_counter()
            mask_np = np.asarray(mask)               # (nb, out_h/8)
            rt.note_rtt(_time.perf_counter() - t0)
            out_h = packed.shape[1]
            bits = np.unpackbits(mask_np, axis=-1, count=out_h)
            kmax = int(bits.sum(axis=1).max())
            k = next((b for b in self._sparse_budgets(out_h)
                      if kmax <= b), None)
            if k is not None and 0 < k < out_h:
                from ...ops.det_device import gather_occupied_rows

                rows_dev, idx_dev = gather_occupied_rows(packed, k=k)
                t0 = _time.perf_counter()
                rows = np.asarray(rows_dev)
                idx = np.asarray(idx_dev)
                rt.note_d2h(rows.nbytes, _time.perf_counter() - t0)
                out = np.zeros(packed.shape, np.uint8)
                np.put_along_axis(out, idx[:, :, None], rows, axis=1)
                return out
        return None

    def collect_candidates(self, handle):
        """Phase 1 of collect: join the link thread's (already running)
        bitmap fetch, extract quad candidates on the host (native C++
        fast path), dispatch the device scoring call and hand its fetch
        to the link thread too. Returns an opaque pending tuple for
        ``finalize`` (or ``finalize_geometry``+``finalize_scores``)."""
        plans, prob_dev, packed, out_w, fetch_fut = handle
        n = len(plans)
        pp_cfg = self.postprocess.cfg
        with stage_timer("det.wait", batch=n):
            packed_np = fetch_fut.result()

        if pp_cfg.score_mode == ScoreMode.SLOW:
            # exact contour scoring → host path (rare mode)
            return ("done", self._host_path(prob_dev, packed_np, plans,
                                            out_w))
        if pp_cfg.box_type == BoxType.POLY:
            return ("done", self._poly_path(prob_dev, packed_np, plans,
                                            out_w))

        # --- quad path: host contours (native C++ fast path), device scores ---
        from ... import native as native_mod
        from ...processors.db_postprocess import order_mini_box_points

        with stage_timer("det.candidates", batch=n):
            use_native = native_mod.available()
            bitmap_all = None
            if not use_native:
                bitmap_all = np.unpackbits(
                    packed_np, axis=-1, count=out_w).astype(np.uint8)
            cand_boxes: List[np.ndarray] = []
            raw_minis: List[np.ndarray] = []
            cand_img: List[int] = []
            per_page_count = []
            for i, p in enumerate(plans):
                if use_native:
                    cands = native_mod.db_candidates(
                        packed_np[i, : p.dst_h], p.dst_h, p.dst_w,
                        self.postprocess.cfg.min_size,
                        self.postprocess.cfg.max_candidates)
                    minis = [order_mini_box_points(q) for q, _side in cands]
                else:
                    bitmap = bitmap_all[i, : p.dst_h, : p.dst_w]
                    minis = self.postprocess.quad_candidates(bitmap)
                per_page_count.append(len(minis))
                for mb in minis:
                    # score on the rounded+clamped quad (db_score.rs
                    # floor/ceil clamp semantics); unclip later uses the
                    # raw float mini-box
                    q = np.round(mb)
                    q[:, 0] = np.clip(q[:, 0], 0, p.dst_w - 1)
                    q[:, 1] = np.clip(q[:, 1], 0, p.dst_h - 1)
                    cand_boxes.append(q.astype(np.float32))
                    raw_minis.append(mb.astype(np.float32))
                    cand_img.append(i)

        scores_fut = None
        k = len(cand_boxes)
        if cand_boxes:
            kb = max(SCORE_BUCKETS.bucket(k), _SCORE_CHUNK)
            quads = np.zeros((kb, 4, 2), np.float32)
            quads[:k] = np.stack(cand_boxes)
            img_idx = np.zeros((kb,), np.int32)
            img_idx[:k] = cand_img
            scores_dev = self._scores(prob_dev, jnp.asarray(quads),
                                      jnp.asarray(img_idx))
            try:
                scores_dev.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
            scores_fut = self.runtime.io_submit(
                self._fetch_scores, scores_dev, k)
        return ("pending", plans, raw_minis, per_page_count, scores_fut, k)

    def _fetch_scores(self, scores_dev, k: int) -> np.ndarray:
        """Link-thread fetch of the per-candidate device scores (a few KB
        — RTT-bound on the tunnel)."""
        import time as _time

        with stage_timer("det.scores", k=k):
            t0 = _time.perf_counter()
            scores = np.asarray(scores_dev)
            self.runtime.note_rtt(_time.perf_counter() - t0)
        return scores[:k]

    def finalize(self, pending
                 ) -> List[Tuple[List[np.ndarray], List[float]]]:
        """Phase 2: join the (already in-flight) scores fetch and build
        the per-page box lists."""
        if pending[0] == "done":
            return pending[1]
        _, plans, raw_minis, per_page_count, scores_fut, k = pending
        results: List[Tuple[List[np.ndarray], List[float]]] = [
            ([], []) for _ in plans]
        if scores_fut is not None:
            with stage_timer("det.scores_wait", k=k):
                scores = scores_fut.result()

            with stage_timer("det.finalize", k=k):
                box_thresh = self.postprocess.cfg.box_thresh
                ci = 0
                for i, p in enumerate(plans):
                    # score filter first (finalize_quad order), then one
                    # batched geometry pass over the page's survivors
                    keep_minis, keep_scores = [], []
                    for _ in range(per_page_count[i]):
                        s = float(scores[ci])
                        if s >= box_thresh:
                            keep_minis.append(raw_minis[ci])
                            keep_scores.append(s)
                        ci += 1
                    geoms = self.postprocess.finalize_quads_batch(
                        keep_minis, p.src_w / float(p.dst_w),
                        p.src_h / float(p.dst_h), p.src_w, p.src_h)
                    boxes = [g for g in geoms if g is not None]
                    bscores = [s for g, s in zip(geoms, keep_scores)
                               if g is not None]
                    results[i] = (boxes, bscores)
        return results

    # ----- speculative split (score filter applied after recognition) ---
    def finalize_geometry(self, pending
                          ) -> Optional[List[Tuple[List[np.ndarray],
                                                   List[float]]]]:
        """Score-free half of :meth:`finalize`: unclip + min-size + scale
        for EVERY candidate, without waiting on the scores fetch. Returns
        per-page ``(boxes, candidate_indices)`` so a pipeline can dispatch
        recognition immediately and drop below-``box_thresh`` boxes when
        :meth:`finalize_scores` delivers (the scores RTT leaves the
        critical path; recognition of later-rejected candidates is wasted
        device compute, which the TPU has to spare — the link is the
        bottleneck). Returns None for non-speculable pendings ("done"
        paths: poly / slow-score / fallback)."""
        if pending[0] != "pending":
            return None
        _, plans, raw_minis, per_page_count, scores_fut, k = pending
        out: List[Tuple[List[np.ndarray], List[float]]] = []
        with stage_timer("det.finalize", k=k):
            ci = 0
            for i, p in enumerate(plans):
                n_i = per_page_count[i]
                geoms = self.postprocess.finalize_quads_batch(
                    raw_minis[ci:ci + n_i], p.src_w / float(p.dst_w),
                    p.src_h / float(p.dst_h), p.src_w, p.src_h)
                boxes = [g for g in geoms if g is not None]
                idxs = [ci + j for j, g in enumerate(geoms)
                        if g is not None]
                ci += n_i
                out.append((boxes, idxs))
        return out

    def finalize_scores(self, pending) -> np.ndarray:
        """Join the scores fetch for a speculative pending; indexed by the
        candidate indices ``finalize_geometry`` returned."""
        _, _plans, _minis, _counts, scores_fut, k = pending
        if scores_fut is None:
            return np.zeros((k,), np.float32)
        with stage_timer("det.scores_wait", k=k):
            return scores_fut.result()

    MAX_POLY_VERTS = 32

    def _poly_path(self, prob_dev, packed_np, plans, out_w):
        """Seal/poly path with device scoring: host contours + approx,
        device ray-casting polygon scores over the resident prob map
        (ops/det_device.poly_scores) — the f32 map never crosses the link."""
        from ...ops.det_device import poly_scores

        n = len(plans)
        with stage_timer("det.candidates", batch=n):
            bitmap_all = np.unpackbits(
                packed_np, axis=-1, count=out_w).astype(np.uint8)
            cand_polys: List[np.ndarray] = []
            cand_img: List[int] = []
            per_page_count = []
            for i, p in enumerate(plans):
                bitmap = bitmap_all[i, : p.dst_h, : p.dst_w]
                approxes = self.postprocess.poly_candidates(bitmap)
                per_page_count.append(len(approxes))
                for a in approxes:
                    cand_polys.append(a)
                    cand_img.append(i)

        results: List[Tuple[List[np.ndarray], List[float]]] = [
            ([], []) for _ in plans]
        if cand_polys:
            k = len(cand_polys)
            chunk = 4
            kb = max(((k + chunk - 1) // chunk) * chunk, chunk)
            pv = self.MAX_POLY_VERTS
            polys = np.zeros((kb, pv, 2), np.float32)
            for ci, a in enumerate(cand_polys):
                if len(a) > pv:
                    # decimate evenly to the vertex cap (scores only; the
                    # unclip still uses the full polygon)
                    sel = np.linspace(0, len(a) - 1, pv).astype(int)
                    a = a[sel]
                polys[ci, : len(a)] = a
                polys[ci, len(a):] = a[0]          # pad = vertex 0
            img_idx = np.zeros((kb,), np.int32)
            img_idx[:k] = cand_img
            with stage_timer("det.poly_scores", k=k):
                scores = np.asarray(poly_scores(
                    prob_dev, jnp.asarray(polys),
                    jnp.asarray(img_idx)))[:k]
            with stage_timer("det.finalize", k=k):
                ci = 0
                for i, p in enumerate(plans):
                    boxes, bscores = [], []
                    for _ in range(per_page_count[i]):
                        out = self.postprocess.finalize_poly(
                            cand_polys[ci], float(scores[ci]),
                            p.src_w / float(p.dst_w),
                            p.src_h / float(p.dst_h), p.src_w, p.src_h)
                        ci += 1
                        if out is not None:
                            boxes.append(out[0])
                            bscores.append(out[1])
                    results[i] = (boxes, bscores)
        return results

    def _host_path(self, prob_dev, packed_np, plans, out_w):
        """Poly / slow-score path: fetch the f32 map and run the full host
        postprocess (exact reference semantics)."""
        prob = np.asarray(prob_dev)
        results = []
        with stage_timer("det.postprocess_host", batch=len(plans)):
            bitmap_all = np.unpackbits(
                packed_np, axis=-1, count=out_w).astype(np.uint8)
            for i, p in enumerate(plans):
                pred = prob[i, : p.dst_h, : p.dst_w]
                bitmap = bitmap_all[i, : p.dst_h, : p.dst_w]
                results.append(self.postprocess(pred, bitmap, p.src_w, p.src_h))
        return results

    def detect_images(self, images: Sequence[np.ndarray]):
        """Convenience: host HWC uint8 RGB images → boxes."""
        shapes = [im.shape[:2] for im in images]
        cfg = self.runtime.cfg
        h = cfg.det_side_buckets.bucket(max(s[0] for s in shapes))
        w = cfg.det_side_buckets.bucket(max(s[1] for s in shapes))
        pages = self.runtime.put(stack_padded(list(images), (h, w)))
        return self.detect(pages, shapes)

"""Adaptive sparse page upload for degraded host->device links.

Upload-side counterpart of the sparse det-bitmap FETCH
(models/detection/detector.py / docs/environment-variables.md link
notes): the axon tunnel's h2d bandwidth swings from 1.2 GB/s down to
single-digit MB/s between sessions, and on a slow link the uint8 page
batch (e.g. 59 MB for 16 A4-ish pages) dominates the whole predict call.

Document pages are mostly constant background, and scanned pages are
frequently true grayscale (R==G==B). Both are lossless compression
opportunities the device can undo bit-exactly:

- **grayscale collapse**: when every page in the chunk has identical
  channels, upload one channel (1/3 of the bytes) and broadcast back to
  RGB on device;
- **constant-tile sparsity**: split the padded batch into 32x32 tiles,
  upload a per-tile base value (the tile min, ~0.1% of the bytes) plus
  only the non-constant tiles with their flat indices, and reassemble
  with one scatter + reshape program on device.

Dense upload is kept whenever the measured h2d bandwidth EMA is healthy
(auto mode), a mesh is active (replicated placement), the page bucket is
not tile-aligned, or the content is too dense to win. The reconstructed
array is bit-identical to ``stack_padded`` + ``device_put`` — asserted
by tests/test_sparse_upload.py.

No reference counterpart: the reference is an in-process library
(oar-ocr-core feeds ORT host pointers); this is TPU-tunnel serving
economics, same family as the sparse det fetch.
"""

from __future__ import annotations

import logging
import math
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LOG = logging.getLogger(__name__)

TILE = 32
# engage sparse only when it beats the best dense option by this factor
# (covers the host analysis cost and the scatter program's device time)
_WIN_RATIO = 0.8


def _sampled_gray(im: np.ndarray) -> bool:
    """Cheap early-out: strided sample before the full channel compare."""
    s = im[::64, ::64]
    return bool(np.array_equal(s[:, :, 0], s[:, :, 1])
                and np.array_equal(s[:, :, 1], s[:, :, 2]))


def _all_gray(images: Sequence[np.ndarray]) -> bool:
    for im in images:
        if im.ndim != 3 or im.shape[2] != 3:
            return False
        if not _sampled_gray(im):
            return False
    for im in images:
        if not (np.array_equal(im[:, :, 0], im[:, :, 1])
                and np.array_equal(im[:, :, 1], im[:, :, 2])):
            return False
    return True


def _tile_buckets(total: int) -> Tuple[int, ...]:
    """Small occupancy bucket table (fractions of the tile count) so the
    scatter program compiles a handful of times per page bucket."""
    fracs = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 3 / 8, 1 / 2, 3 / 4)
    return tuple(sorted({max(1, math.ceil(total * f)) for f in fracs}))


def _rebuild(base, tiles, idx):
    """Device-side reassembly: broadcast per-tile base values, scatter the
    occupied tiles, restore (B, H, W, 3) page layout. Bit-exact."""
    import jax.numpy as jnp

    b, nth, ntw, c = base.shape
    n = b * nth * ntw
    grid = jnp.broadcast_to(base.reshape(n, 1, 1, c), (n, TILE, TILE, c))
    grid = grid.at[idx].set(tiles)
    pages = (grid.reshape(b, nth, ntw, TILE, TILE, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, nth * TILE, ntw * TILE, c))
    if c == 1:
        pages = jnp.broadcast_to(pages, pages.shape[:3] + (3,))
    return pages


def _rebuild_bilevel(base, tiles, idx, bits, lo, hi, bidx):
    """Device-side reassembly with a BILEVEL tile group: dense tiles
    scatter as in :func:`_rebuild`; bilevel tiles (exactly two distinct
    values — text on flat background, the core OCR content) arrive as
    1 bit/px + lo/hi colors and are expanded on device. Bit-exact."""
    import jax.numpy as jnp

    b, nth, ntw, c = base.shape
    n = b * nth * ntw
    grid = jnp.broadcast_to(base.reshape(n, 1, 1, c), (n, TILE, TILE, c))
    grid = grid.at[idx].set(tiles)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)     # MSB-first
    bl = ((bits[:, :, None] >> shifts) & 1).astype(jnp.uint8)
    bl = bl.reshape(-1, TILE, TILE, 1)
    btiles = (lo[:, None, None, :]
              + (hi - lo)[:, None, None, :] * bl)       # hi >= lo: no wrap
    grid = grid.at[bidx].set(btiles)
    pages = (grid.reshape(b, nth, ntw, TILE, TILE, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, nth * TILE, ntw * TILE, c))
    if c == 1:
        pages = jnp.broadcast_to(pages, pages.shape[:3] + (3,))
    return pages


def _gray_to_rgb(x):
    import jax.numpy as jnp

    return jnp.broadcast_to(x, x.shape[:3] + (3,))


_jit_rebuild = None
_jit_rebuild_bl = None
_jit_gray = None


def _jits():
    global _jit_rebuild, _jit_rebuild_bl, _jit_gray
    if _jit_rebuild is None:
        import jax

        _jit_rebuild = jax.jit(_rebuild)
        _jit_rebuild_bl = jax.jit(_rebuild_bilevel)
        _jit_gray = jax.jit(_gray_to_rgb)
    return _jit_rebuild, _jit_gray




def upload_pages(runtime, images: Sequence[np.ndarray],
                 target_hw: Tuple[int, int]):
    """Upload variable-size HWC uint8 pages as one padded (B, H, W, 3)
    device batch, choosing dense / gray-collapsed / tile-sparse transfer
    per the link policy. Drop-in for
    ``runtime.put(stack_padded(images, target_hw))``."""
    from .runtime import stack_padded

    cfg = runtime.cfg
    h, w = target_hw
    mode = cfg.page_upload
    dense_bytes = len(images) * h * w * 3

    # mesh-compatible (VERDICT r4 item 4): the compressed payload is
    # placed REPLICATED and the rebuild program runs replicated, so the
    # reconstructed batch has exactly the placement runtime.put gives the
    # dense upload
    adaptive = (mode != "off" and h % TILE == 0 and w % TILE == 0)
    if adaptive and mode == "auto":
        bw = runtime.h2d_mbps
        adaptive = bw is not None and bw < cfg.upload_sparse_bw_mbps
        if adaptive and runtime.h2d_recovery_due():
            # scheduled dense upload: the only way a recovered link can
            # be noticed without a blocking probe — its h2d_checkpoint
            # observation raises the EMA back above the threshold. At
            # most one per link_recovery_interval_s (time-based; the
            # clock is reset here AND in _put_dense so organic dense
            # uploads also count as measurements).
            runtime.note_recovery("upload_dense")
            runtime.note_dense_upload()
            adaptive = False

    if not adaptive:
        batch = stack_padded(list(images), (h, w))
        return _put_dense(runtime, batch)

    from ..utils.tracing import stage_timer

    with stage_timer("upload.analyze", pages=len(images)):
        native = _native_plan(images, h, w, dense_bytes)
        if native is not None:
            gray, plan, batch = native
        else:
            gray = _all_gray(images)
            if gray:
                batch = stack_padded([im[:, :, 0] for im in images], (h, w))
            else:
                batch = stack_padded(list(images), (h, w))
            plan = _analyze(batch)
    best_dense = dense_bytes // 3 if gray else dense_bytes
    if plan is not None:
        # bilevel split: text-on-flat-background tiles ship as
        # 1 bit/px + 2 colors (~8x fewer bytes than raw tiles)
        split = _split_bilevel(plan)
        if split is not None and split[-1] < plan[3]:
            plan = split
    if plan is not None and plan[-1] < _WIN_RATIO * best_dense:
        try:
            return _put_sparse(runtime, plan, gray)
        except Exception as e:  # pragma: no cover - tunnel flake
            # a transient remote-compile failure on a first-seen tile
            # bucket must not kill the predict — dense is always valid
            runtime.note_degrade("sparse_upload")
            _LOG.warning("sparse page upload failed (%s); dense", e)
    if batch is None:                      # native path defers stacking
        from .. import native as native_mod

        batch = native_mod.stack_pages(images, h, w, gray)
    if gray:
        try:
            return _put_gray(runtime, batch)
        except Exception as e:  # pragma: no cover - tunnel flake
            runtime.note_degrade("gray_upload")
            _LOG.warning("gray page upload failed (%s); dense", e)
            batch = np.repeat(batch, 3, axis=-1)   # (B,H,W,1) → RGB
    return _put_dense(runtime, batch)


def _native_plan(images, h: int, w: int, dense_bytes: int):
    """Single-pass native analysis (native/page_tiles.cpp): returns
    (gray, plan-or-None, batch-or-None) matching the NumPy path
    bit-exactly, or None when the native module is unavailable. The
    padded batch is never materialized unless the dense fallback needs
    it, and occupied tiles are gathered straight from the source pages."""
    from .. import native as native_mod

    res = native_mod.analyze_pages(images, h, w, TILE)
    if res is None:
        return None
    gray, base3, occ = res
    base = np.ascontiguousarray(base3[..., :1]) if gray else base3
    c = 1 if gray else 3
    n_occ = int(occ.sum())
    total = occ.size
    buckets = _tile_buckets(total)
    rescue = False
    if n_occ > buckets[-1]:
        if not _native_rescue_ok(images, h, w, occ, gray):
            return gray, None, None
        buckets = buckets + (total,)
        rescue = True
    n_pad = next(s for s in buckets if s >= max(n_occ, 1))
    payload = (n_pad * TILE * TILE * c) + base.nbytes + n_pad * 4
    best_dense = dense_bytes // 3 if gray else dense_bytes
    if payload >= _WIN_RATIO * best_dense and not rescue:
        # raw tiles don't pay; gathering is still worth it when the
        # content is bilevel (the split packs it ~8x)
        if not _native_rescue_ok(images, h, w, occ, gray):
            return gray, None, None
    if n_occ == 0:
        tiles = np.broadcast_to(
            base[0, 0, 0][None, None, None, :], (1, TILE, TILE, c)).copy()
        idx = np.zeros((1,), np.int32)
        n_occ = 1
    else:
        idx = np.flatnonzero(occ.reshape(-1)).astype(np.int32)
        tiles = native_mod.gather_tiles(images, h, w, TILE, idx, gray)
    if n_pad > n_occ:
        tiles = np.concatenate(
            [tiles, np.repeat(tiles[:1], n_pad - n_occ, axis=0)])
        idx = np.concatenate([idx, np.repeat(idx[:1], n_pad - n_occ)])
    return gray, (base, tiles, idx, payload), None


def _native_rescue_ok(images, h: int, w: int, occ, gray: bool) -> bool:
    """Sampled bilevel check for the high-occupancy rescue, native
    gather variant (a handful of tiles, negligible cost)."""
    from .. import native as native_mod

    flat = np.flatnonzero(occ.reshape(-1)).astype(np.int32)
    if flat.size == 0:
        return False
    step = max(1, flat.size // _RESCUE_SAMPLE)
    sample = native_mod.gather_tiles(images, h, w, TILE, flat[::step],
                                     gray)
    return _bilevel_frac(sample) >= _RESCUE_FRAC


def _analyze(batch: np.ndarray):
    """Per-tile constancy analysis on the padded (B, H, W[, C]) batch.
    Returns (base, tiles, idx, payload_bytes), or None when the content
    is too dense for the largest occupancy bucket AND a sampled bilevel
    check fails (dense-TEXT pages pass and proceed at full occupancy —
    the bilevel split still packs them ~8x)."""
    if batch.ndim == 3:
        batch = batch[..., None]
    b, h, w, c = batch.shape
    nth, ntw = h // TILE, w // TILE
    t = batch.reshape(b, nth, TILE, ntw, TILE, c)
    tmin = t.min(axis=(2, 4))
    tmax = t.max(axis=(2, 4))
    occ = (tmin != tmax).any(axis=-1)           # (B, nth, ntw)
    n_occ = int(occ.sum())
    total = b * nth * ntw
    buckets = _tile_buckets(total)
    if n_occ > buckets[-1]:
        bi, ti, tj = np.nonzero(occ)
        step = max(1, len(bi) // _RESCUE_SAMPLE)
        sample = np.ascontiguousarray(
            t[bi[::step], ti[::step], :, tj[::step], :, :])
        if _bilevel_frac(sample) < _RESCUE_FRAC:
            return None
        buckets = buckets + (total,)
    n_pad = next(s for s in buckets if s >= max(n_occ, 1))
    bi, ti, tj = np.nonzero(occ)
    # advanced indexing copies only the occupied tiles (no full transpose)
    tiles = np.ascontiguousarray(
        t[bi, ti, :, tj, :, :])                 # (N, TILE, TILE, C)
    idx = ((bi * nth + ti) * ntw + tj).astype(np.int32)
    if n_occ == 0:
        tiles = np.broadcast_to(
            tmin[0, 0, 0][None, None, None, :],
            (1, TILE, TILE, c)).copy()
        idx = np.zeros((1,), np.int32)
        n_occ = 1
    if n_pad > n_occ:
        tiles = np.concatenate(
            [tiles, np.repeat(tiles[:1], n_pad - n_occ, axis=0)])
        idx = np.concatenate(
            [idx, np.repeat(idx[:1], n_pad - n_occ)])
    payload = tiles.nbytes + tmin.nbytes + idx.nbytes
    return (tmin, tiles, idx, payload)


def _bl_buckets(total: int) -> Tuple[int, ...]:
    """Coarse occupancy buckets for the SPLIT (dense, bilevel) upload:
    each distinct (dense-bucket, bilevel-bucket) pair is one compiled
    scatter program on a minutes-per-compile tunnel, so both groups
    quantize to four sizes (content is stable across a session, so a
    run typically compiles exactly one pair). The full bucket exists
    for dense-TEXT pages (high occupancy, bilevel content)."""
    fracs = (1 / 16, 1 / 4, 3 / 4, 1.0)
    return tuple(sorted({max(1, math.ceil(total * f)) for f in fracs}))


# high-occupancy bilevel rescue: sample this many occupied tiles and
# proceed with the (otherwise losing) full gather only when at least
# this fraction of them are bilevel — dense-TEXT pages pass (bilevel
# packs them ~8x), noise/photo pages fail and stay on the dense upload
_RESCUE_SAMPLE = 48
_RESCUE_FRAC = 0.9


def _bilevel_frac(tiles: np.ndarray) -> float:
    """Fraction of tiles whose every pixel equals the tile's min or max
    vector (the _split_bilevel membership test)."""
    if tiles.shape[0] == 0:
        return 0.0
    tmin = tiles.min(axis=(1, 2), keepdims=True)
    tmax = tiles.max(axis=(1, 2), keepdims=True)
    is_bl = (((tiles == tmax).all(axis=-1))
             | ((tiles == tmin).all(axis=-1))).all(axis=(1, 2))
    return float(is_bl.mean())


def _pad_group(tiles, idx, buckets):
    """Pad a tile group to its occupancy bucket by repeating element 0
    (duplicate scatter indices write identical values). None when the
    group overflows the largest bucket."""
    n = tiles.shape[0]
    fit = next((s for s in buckets if s >= n), None)
    if fit is None:
        return None
    if fit > n:
        tiles = np.concatenate(
            [tiles, np.repeat(tiles[:1], fit - n, axis=0)])
        idx = np.concatenate([idx, np.repeat(idx[:1], fit - n)])
    return tiles, idx


def _split_bilevel(plan):
    """Split the occupied tiles of ``plan`` into a BILEVEL group (every
    pixel equals the tile's per-channel min vector or max vector — text
    on flat background, shipped as 1 bit/px + the two colors) and a
    dense remainder (antialiased edges, halftones, photos). Returns
    (base, dense_tiles, dense_idx, bits, lo, hi, bl_idx, payload) or
    None when too few tiles are bilevel to pay for the second scatter
    (the caller keeps the single-group plan). Reconstruction is
    bit-exact: the membership test is against the exact lo/hi vectors
    the device rebuild uses."""
    base, tiles, idx, _ = plan
    n = tiles.shape[0]
    c = tiles.shape[3]
    total = base.shape[0] * base.shape[1] * base.shape[2]
    tmin = tiles.min(axis=(1, 2), keepdims=True)
    tmax = tiles.max(axis=(1, 2), keepdims=True)
    eq_hi = (tiles == tmax).all(axis=-1)             # (N, TILE, TILE)
    eq_lo = (tiles == tmin).all(axis=-1)
    is_bl = (eq_hi | eq_lo).all(axis=(1, 2))
    nb = int(is_bl.sum())
    if nb < max(16, n // 4):
        return None
    buckets = _bl_buckets(total)
    bl = _pad_group(tiles[is_bl], idx[is_bl], buckets)
    dn_tiles, dn_idx = tiles[~is_bl], idx[~is_bl]
    if dn_tiles.shape[0] == 0:
        # empty dense group: one synthetic base-valued tile at flat
        # index 0 (== the broadcast background there; the bilevel
        # scatter runs after and overwrites if tile 0 is occupied)
        dn_tiles = np.broadcast_to(
            base[0, 0, 0][None, None, None, :], (1, TILE, TILE, c)
        ).astype(np.uint8).copy()
        dn_idx = np.zeros((1,), np.int32)
    dn = _pad_group(dn_tiles, dn_idx, buckets)
    if bl is None or dn is None:
        return None
    bl_tiles, bl_idx = bl
    dn_tiles, dn_idx = dn
    lo = np.ascontiguousarray(
        bl_tiles.min(axis=(1, 2)))                   # (Nb, c)
    hi = np.ascontiguousarray(bl_tiles.max(axis=(1, 2)))
    bits = np.packbits(
        (bl_tiles == hi[:, None, None, :]).all(axis=-1), axis=-1)
    bits = bits.reshape(bl_tiles.shape[0], -1)       # (Nb, TILE*TILE/8)
    payload = (bits.nbytes + lo.nbytes + hi.nbytes + bl_idx.nbytes
               + dn_tiles.nbytes + dn_idx.nbytes + base.nbytes)
    return (base, dn_tiles, dn_idx, bits, lo, hi, bl_idx, payload)


def _placement(runtime):
    """Upload destination: replicated over the mesh when one is active
    (matching `Runtime.put` for the dense batch), else the primary
    device."""
    if runtime.mesh is not None:
        return runtime.replicated_sharding()
    return runtime.device


def _put_sparse(runtime, plan, gray: bool):
    import jax

    _jits()
    t0 = time.perf_counter()
    dst = _placement(runtime)
    if len(plan) == 8:                      # bilevel split plan
        base, tiles, idx, bits, lo, hi, bidx, payload = plan
        args = [jax.device_put(a, dst)
                for a in (base, tiles, idx, bits, lo, hi, bidx)]
        out = _jit_rebuild_bl(*args)
        _finish_timed(runtime, out, payload, t0,
                      ("sparse_bl", base.shape, tiles.shape,
                       bits.shape))
        return out
    base, tiles, idx, payload = plan
    dev_base = jax.device_put(base, dst)
    dev_tiles = jax.device_put(tiles, dst)
    dev_idx = jax.device_put(idx, dst)
    out = _jit_rebuild(dev_base, dev_tiles, dev_idx)
    _finish_timed(runtime, out, payload, t0,
                  ("sparse", base.shape, tiles.shape))
    return out


def _put_gray(runtime, batch: np.ndarray):
    """Upload a channel-collapsed (B, H, W, 1) batch, broadcast on device."""
    import jax

    _, gray3 = _jits()
    t0 = time.perf_counter()
    dev = jax.device_put(batch, _placement(runtime))
    out = gray3(dev)
    # a full-size (1/3) transfer is a real link measurement via the
    # checkpoint observation — reset the probe clock like dense does
    runtime.note_dense_upload()
    _finish_timed(runtime, out, batch.nbytes, t0, ("gray", batch.shape))
    return out


def _put_dense(runtime, batch: np.ndarray):
    t0 = time.perf_counter()
    out = runtime.put(batch)
    runtime.note_dense_upload()
    _finish_timed(runtime, out, batch.nbytes, t0, ("dense", batch.shape))
    return out


def _finish_timed(runtime, dev, payload: int, t0: float, signature) -> None:
    """Register the transfer for FREE bandwidth observation
    (Runtime.note_upload_start → h2d_checkpoint): the pipeline times the
    window to its first dependent d2h fetch — which predict pays anyway —
    instead of issuing any completion fetch. A blocking probe here cost a
    link-serialized chunk upload per stale interval (835 ms measured on a
    degraded tunnel — the r3 BENCH first-iteration cliff)."""
    runtime.h2d_bytes_total += payload
    runtime.h2d_put_count += 1
    if runtime.cfg.page_upload == "off":
        return
    runtime.touch()
    runtime.note_upload_start(payload, t0)

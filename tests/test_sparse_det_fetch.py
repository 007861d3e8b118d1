"""Sparse det-bitmap fetch (ops/det_device.py gather_occupied_tiles/rows
+ models/detection/detector.py _fetch_bitmap): on a degraded d2h link
only a tiny occupancy mask and the occupied 16×32-px tiles (per-row
fallback for non-tileable shapes) cross the link, and the host
reassembly must be BIT-IDENTICAL to the full fetch — the detection path
is parity-critical (SURVEY §8)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from oar_ocr_tpu.config.runtime import RuntimeConfig
from oar_ocr_tpu.ops.det_device import (DET_TILE_H, DET_TILE_W8,
                                        gather_occupied_rows,
                                        gather_occupied_tiles, pack_bits,
                                        row_occupancy_mask,
                                        tile_occupancy_mask)
from oar_ocr_tpu.runtime.runtime import Runtime


def _reassemble(packed_dev, k):
    rows, idx = gather_occupied_rows(packed_dev, k=k)
    rows, idx = np.asarray(rows), np.asarray(idx)
    out = np.zeros(packed_dev.shape, np.uint8)
    np.put_along_axis(out, idx[:, :, None], rows, axis=1)
    return out


@pytest.mark.parametrize("occupancy", [0.0, 0.1, 0.45])
def test_gather_rows_bit_exact(rng, occupancy):
    b, h, w = 3, 64, 128
    bitmap = (rng.random((b, h, w)) < 0.3).astype(np.uint8)
    # keep only a fraction of rows occupied
    row_keep = rng.random((b, h, 1)) < occupancy
    bitmap = bitmap * row_keep
    packed_dev = pack_bits(jnp.asarray(bitmap))
    full = np.asarray(packed_dev)
    for k in (h // 2, 3 * h // 4, h):
        if int(row_keep.sum(axis=1).max()) <= k:
            assert np.array_equal(_reassemble(packed_dev, k), full), k


def _reassemble_tiles(packed_dev, k):
    b, h, w8 = packed_dev.shape
    nth, ntw = h // DET_TILE_H, w8 // DET_TILE_W8
    tiles, idx = gather_occupied_tiles(packed_dev, k=k)
    tiles, idx = np.asarray(tiles), np.asarray(idx)
    out_t = np.zeros((b, nth * ntw, DET_TILE_H * DET_TILE_W8), np.uint8)
    np.put_along_axis(out_t, idx[:, :, None], tiles, axis=1)
    return (out_t.reshape(b, nth, ntw, DET_TILE_H, DET_TILE_W8)
            .transpose(0, 1, 3, 2, 4).reshape(packed_dev.shape))


@pytest.mark.parametrize("occupancy", [0.0, 0.05, 0.3])
def test_gather_tiles_bit_exact(rng, occupancy):
    b, h, w = 2, 64, 256                      # w8 = 32 → 4×8 tile grid
    nth, ntw = h // DET_TILE_H, (w // 8) // DET_TILE_W8
    nt = nth * ntw
    tile_keep = rng.random((b, nth, 1, ntw, 1)) < occupancy
    bitmap = (rng.random((b, h, w)) < 0.4).astype(np.uint8)
    bitmap = (bitmap.reshape(b, nth, DET_TILE_H, ntw, DET_TILE_W8 * 8)
              * tile_keep).reshape(b, h, w)
    packed_dev = pack_bits(jnp.asarray(bitmap))
    full = np.asarray(packed_dev)
    n_occ = int(np.unpackbits(
        np.asarray(tile_occupancy_mask(packed_dev)), axis=-1,
        count=nt).sum(axis=1).max())
    for k in (max(n_occ, 1), nt // 2, nt):
        if n_occ <= k:
            assert np.array_equal(_reassemble_tiles(packed_dev, k), full), k


def test_tile_mask_matches_numpy(rng):
    b, h, w = 2, 32, 256
    nth, ntw = h // DET_TILE_H, (w // 8) // DET_TILE_W8
    bitmap = (rng.random((b, h, w)) < 0.02).astype(np.uint8)
    packed_dev = pack_bits(jnp.asarray(bitmap))
    mask = np.asarray(tile_occupancy_mask(packed_dev))
    bits = np.unpackbits(mask, axis=-1, count=nth * ntw)
    expect = (bitmap.reshape(b, nth, DET_TILE_H, ntw, DET_TILE_W8 * 8)
              .any(axis=(2, 4)).reshape(b, -1).astype(np.uint8))
    assert np.array_equal(bits, expect)


def test_tile_mask_nonbyte_tile_count(rng):
    """Legal det buckets can yield a flat tile count that is NOT a
    multiple of 8 (e.g. 704×4000 → 5500 tiles); the occupancy mask must
    byte-pad instead of crashing pack_bits — the old failure was
    swallowed as a 'tunnel flake' and silently disabled sparse det."""
    b, h, w = 1, 32, 1280                     # nt = 2·40 = 80? no: use odd
    # w8 = 160 → ntw = 40, nth = 2 → nt = 80 (multiple of 8); shrink to
    # force nt % 8 != 0: w = 1120 → w8 = 140 → ntw = 35, nt = 70
    w = 1120
    nth, ntw = h // DET_TILE_H, (w // 8) // DET_TILE_W8
    nt = nth * ntw
    assert nt % 8 != 0
    bitmap = (rng.random((b, h, w)) < 0.02).astype(np.uint8)
    packed_dev = pack_bits(jnp.asarray(bitmap))
    mask = np.asarray(tile_occupancy_mask(packed_dev))
    assert mask.shape[-1] == (nt + 7) // 8
    bits = np.unpackbits(mask, axis=-1, count=nt)
    expect = (bitmap.reshape(b, nth, DET_TILE_H, ntw, DET_TILE_W8 * 8)
              .any(axis=(2, 4)).reshape(b, -1).astype(np.uint8))
    assert np.array_equal(bits, expect)


def test_row_mask_matches_numpy(rng):
    b, h, w = 2, 32, 64
    bitmap = (rng.random((b, h, w)) < 0.05).astype(np.uint8)
    packed_dev = pack_bits(jnp.asarray(bitmap))
    mask = np.asarray(row_occupancy_mask(packed_dev))
    bits = np.unpackbits(mask, axis=-1, count=h)
    assert np.array_equal(bits, bitmap.any(axis=-1).astype(np.uint8))


def test_runtime_auto_policy_flips_on_bandwidth():
    rt = Runtime(RuntimeConfig(det_sparse_fetch="auto",
                               det_sparse_bw_mbps=20.0, use_mesh=False))
    assert not rt.det_sparse_active()       # no estimate yet → full
    rt.note_rtt(0.001)
    rt.note_d2h(1_000_000, 0.301)           # ~3.3 MB/s
    assert rt.det_sparse_active()
    for _ in range(12):                     # link recovers
        rt.note_d2h(1_000_000, 0.002)       # ~1 GB/s
    assert not rt.det_sparse_active()
    rt2 = Runtime(RuntimeConfig(det_sparse_fetch="on", use_mesh=False))
    assert rt2.det_sparse_active()
    rt3 = Runtime(RuntimeConfig(det_sparse_fetch="off", use_mesh=False))
    rt3.note_d2h(1_000_000, 10.0)
    assert not rt3.det_sparse_active()


@pytest.fixture(scope="module")
def doc_image():
    rng = np.random.default_rng(7)
    img = np.full((240, 320, 3), 255, np.uint8)
    img[40:70, 30:290] = rng.integers(0, 60)
    img[120:150, 30:160] = rng.integers(0, 60)
    return img


def test_detector_sparse_matches_full(doc_image):
    """Forced-sparse detection produces identical boxes/scores to the
    full fetch (overflow-safe bit-exact reassembly end to end)."""
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder

    def boxes(mode):
        rt = Runtime(RuntimeConfig(det_sparse_fetch=mode, use_mesh=False))
        pipe = (OAROCRBuilder("general").with_runtime(rt)
                .with_det_config(box_thresh=0.05, thresh=0.45).build())
        det = pipe.detector
        h, w = doc_image.shape[:2]
        cfg = rt.cfg
        from oar_ocr_tpu.runtime.runtime import stack_padded

        pages = rt.put(stack_padded(
            [doc_image], (cfg.det_side_buckets.bucket(h),
                          cfg.det_side_buckets.bucket(w))))
        return det.detect(pages, [(h, w)])

    full = boxes("off")
    sparse = boxes("on")
    assert len(full) == len(sparse) == 1
    fb, fs = full[0]
    sb, ss = sparse[0]
    assert len(fb) == len(sb)
    for a, b in zip(fb, sb):
        assert np.allclose(a, b)
    assert np.allclose(fs, ss)


def test_dense_bitmap_falls_back_to_full(rng, monkeypatch):
    """> 3/4 occupied rows → the sparse path must fall back to the full
    transfer (budget exhausted) and still be exact."""
    from oar_ocr_tpu.models.detection.detector import DBDetector

    rt = Runtime(RuntimeConfig(det_sparse_fetch="on", use_mesh=False))
    det = DBDetector.__new__(DBDetector)
    det.runtime = rt
    b, h, w = 2, 32, 64
    bitmap = np.ones((b, h, w), np.uint8)          # fully dense
    packed_dev = pack_bits(jnp.asarray(bitmap))
    out = det._fetch_bitmap(packed_dev, row_occupancy_mask(packed_dev),
                            "row")
    assert np.array_equal(out, np.asarray(packed_dev))
    det2 = DBDetector.__new__(DBDetector)
    det2.runtime = rt
    b, h, w = 2, 32, 256                           # tileable shape
    packed_dev = pack_bits(jnp.asarray(np.ones((b, h, w), np.uint8)))
    out = det2._fetch_bitmap(packed_dev, tile_occupancy_mask(packed_dev),
                             "tile")
    assert np.array_equal(out, np.asarray(packed_dev))


def test_gather_tiles_packed_one_fetch(rng):
    """The one-fetch payload (count+idx+tiles) reassembles bit-exactly
    when the budget covers the occupancy, and its count field reports
    the true occupied-tile count for overflow detection."""
    from oar_ocr_tpu.ops.det_device import gather_occupied_tiles_packed

    b, h, w = 2, 64, 256
    nth, ntw = h // DET_TILE_H, (w // 8) // DET_TILE_W8
    nt = nth * ntw
    tile_b = DET_TILE_H * DET_TILE_W8
    bitmap = np.zeros((b, h, w), np.uint8)
    bitmap[0, 18:30, 40:200] = (rng.random((12, 160)) < 0.5)
    bitmap[1, 0:10, 0:64] = 1
    packed_dev = pack_bits(jnp.asarray(bitmap))
    full = np.asarray(packed_dev)
    true_occ = (full.reshape(b, nth, DET_TILE_H, ntw, DET_TILE_W8)
                .any(axis=(2, 4)).reshape(b, -1).sum(axis=1))
    for k in (int(true_occ.max()), nt // 2, nt):
        arr = np.asarray(gather_occupied_tiles_packed(packed_dev, k=k))
        assert arr.shape == (b, 4 + k * (4 + tile_b))
        counts = arr[:, :4].copy().view(np.int32)[:, 0]
        assert np.array_equal(counts, true_occ)
        idx = arr[:, 4:4 + 4 * k].copy().view(np.int32).reshape(b, k)
        tiles = arr[:, 4 + 4 * k:].reshape(b, k, tile_b)
        out_t = np.zeros((b, nt, tile_b), np.uint8)
        np.put_along_axis(out_t, idx[:, :, None], tiles, axis=1)
        got = (out_t.reshape(b, nth, ntw, DET_TILE_H, DET_TILE_W8)
               .transpose(0, 1, 3, 2, 4).reshape(full.shape))
        assert np.array_equal(got, full), k


def test_detector_fetch_tile_spec_and_overflow(rng):
    """The speculative one-fetch path reassembles bit-exactly; an
    under-sized budget overflows and falls back to the full transfer
    (still exact) while raising the history for the next guess."""
    from oar_ocr_tpu.models.detection.detector import DBDetector
    from oar_ocr_tpu.ops.det_device import gather_occupied_tiles_packed

    rt = Runtime(RuntimeConfig(det_sparse_fetch="on", use_mesh=False))
    det = DBDetector.__new__(DBDetector)
    det.runtime = rt
    b, h, w = 2, 64, 256
    nth, ntw = h // DET_TILE_H, (w // 8) // DET_TILE_W8
    nt = nth * ntw
    bitmap = np.zeros((b, h, w), np.uint8)
    bitmap[:, 18:30, 40:200] = (rng.random((b, 12, 160)) < 0.5)
    packed_dev = pack_bits(jnp.asarray(bitmap))
    full = np.asarray(packed_dev)

    # covering budget → one-fetch exact + history seeded with true kmax
    k_ok = nt // 2
    out = det._fetch_bitmap(
        packed_dev, gather_occupied_tiles_packed(packed_dev, k=k_ok),
        "tile_spec")
    assert np.array_equal(out, full)
    true_kmax = int((full.reshape(b, nth, DET_TILE_H, ntw, DET_TILE_W8)
                     .any(axis=(2, 4)).reshape(b, -1).sum(axis=1)).max())
    assert det._tile_kmax[nt] == true_kmax

    # overflowing budget (k=1 < occupancy) → full-fetch fallback, exact
    det2 = DBDetector.__new__(DBDetector)
    det2.runtime = rt
    out = det2._fetch_bitmap(
        packed_dev, gather_occupied_tiles_packed(packed_dev, k=1),
        "tile_spec")
    assert np.array_equal(out, full)
    assert det2._tile_kmax[nt] == true_kmax


def test_tile_budget_predictor():
    """No history → None (mask-first seeds it); history → smallest
    budget covering kmax×1.3; dense history → None (no budget pays)."""
    from oar_ocr_tpu.models.detection.detector import DBDetector

    det = DBDetector.__new__(DBDetector)
    nt = 128
    assert det._predict_tile_budget(nt) is None
    det._note_tile_kmax(nt, 8)
    k = det._predict_tile_budget(nt)
    assert k is not None and k >= int(8 * 1.3) + 4
    assert k in det._tile_budgets(nt)
    # history rises instantly on a denser batch...
    det._note_tile_kmax(nt, 60)
    assert det._tile_kmax[nt] == 60
    # ...and too-dense history disables speculation (needs > nt/2)
    det._note_tile_kmax(nt, 120)
    assert det._predict_tile_budget(nt) is None
    # decay: a one-off dense page doesn't pin the budget forever
    for _ in range(40):
        det._note_tile_kmax(nt, 4)
    assert det._predict_tile_budget(nt) is not None


def test_detector_sparse_spec_second_batch_matches(doc_image):
    """End-to-end: the SECOND forced-sparse detect goes through the
    speculative one-fetch path (history seeded by the first) and must
    produce identical boxes/scores to the full fetch."""
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
    from oar_ocr_tpu.runtime.runtime import stack_padded

    def run(mode, repeats):
        rt = Runtime(RuntimeConfig(det_sparse_fetch=mode, use_mesh=False))
        pipe = (OAROCRBuilder("general").with_runtime(rt)
                .with_det_config(box_thresh=0.05, thresh=0.45).build())
        det = pipe.detector
        h, w = doc_image.shape[:2]
        cfg = rt.cfg
        pages = rt.put(stack_padded(
            [doc_image], (cfg.det_side_buckets.bucket(h),
                          cfg.det_side_buckets.bucket(w))))
        outs = [det.detect(pages, [(h, w)]) for _ in range(repeats)]
        return det, outs[-1]

    _, full = run("off", 1)
    det, sparse2 = run("on", 2)
    # the second run must have had history → speculation engaged
    assert getattr(det, "_tile_kmax", {}), "tile history never seeded"
    fb, fs = full[0]
    sb, ss = sparse2[0]
    assert len(fb) == len(sb)
    for a, b in zip(fb, sb):
        assert np.allclose(a, b)
    assert np.allclose(fs, ss)


def test_detector_fetch_tile_sparse_partial(rng):
    """A partially occupied tileable bitmap goes through the tile-gather
    path inside _fetch_bitmap and reassembles bit-exactly."""
    from oar_ocr_tpu.models.detection.detector import DBDetector

    rt = Runtime(RuntimeConfig(det_sparse_fetch="on", use_mesh=False))
    det = DBDetector.__new__(DBDetector)
    det.runtime = rt
    b, h, w = 2, 64, 256
    bitmap = np.zeros((b, h, w), np.uint8)
    bitmap[:, 18:30, 40:200] = (rng.random((b, 12, 160)) < 0.5)
    packed_dev = pack_bits(jnp.asarray(bitmap))
    out = det._fetch_bitmap(packed_dev, tile_occupancy_mask(packed_dev),
                            "tile")
    assert np.array_equal(out, np.asarray(packed_dev))


def test_sparse_dispatch_failure_degrades_to_full(doc_image, monkeypatch):
    """A transient device/compile failure while building the sparse
    payload at dispatch (observed: a remote-compile tunnel drop on a
    first-seen budget shape) must degrade to the full transfer, not
    kill the predict."""
    import oar_ocr_tpu.ops.det_device as dd
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
    from oar_ocr_tpu.runtime.runtime import stack_padded

    def boxes(mode, sabotage):
        rt = Runtime(RuntimeConfig(det_sparse_fetch=mode, use_mesh=False))
        pipe = (OAROCRBuilder("general").with_runtime(rt)
                .with_det_config(box_thresh=0.05, thresh=0.45).build())
        if sabotage:
            def boom(*a, **k):
                raise RuntimeError("remote_compile: body closed")

            monkeypatch.setattr(dd, "tile_occupancy_mask", boom)
            monkeypatch.setattr(dd, "gather_occupied_tiles_packed", boom)
            monkeypatch.setattr(dd, "row_occupancy_mask", boom)
        det = pipe.detector
        h, w = doc_image.shape[:2]
        cfg = rt.cfg
        pages = rt.put(stack_padded(
            [doc_image], (cfg.det_side_buckets.bucket(h),
                          cfg.det_side_buckets.bucket(w))))
        out = det.detect(pages, [(h, w)])
        monkeypatch.undo()
        return out

    full = boxes("off", sabotage=False)
    degraded = boxes("on", sabotage=True)
    (fb, fs), (sb, ss) = full[0], degraded[0]
    assert len(fb) == len(sb) and len(fb) > 0
    for a, b in zip(fb, sb):
        assert np.allclose(a, b)
    assert np.allclose(fs, ss)


def test_sparse_fetch_failure_degrades_to_full(rng, monkeypatch):
    """A failure inside the budgeted gather at fetch time (mode "tile",
    link thread) falls through to the bit-exact full transfer."""
    import oar_ocr_tpu.ops.det_device as dd
    from oar_ocr_tpu.models.detection.detector import DBDetector

    rt = Runtime(RuntimeConfig(det_sparse_fetch="on", use_mesh=False))
    det = DBDetector.__new__(DBDetector)
    det.runtime = rt
    b, h, w = 2, 64, 256
    bitmap = np.zeros((b, h, w), np.uint8)
    bitmap[:, 18:30, 40:200] = (rng.random((b, 12, 160)) < 0.5)
    packed_dev = pack_bits(jnp.asarray(bitmap))
    mask = tile_occupancy_mask(packed_dev)

    def boom(*a, **k):
        raise RuntimeError("remote_compile: body closed")

    monkeypatch.setattr(dd, "gather_occupied_tiles", boom)
    out = det._fetch_bitmap(packed_dev, mask, "tile")
    assert np.array_equal(out, np.asarray(packed_dev))


def test_persistent_sparse_failure_escalates_and_disables(rng, monkeypatch,
                                                          caplog):
    """Consecutive sparse-path failures escalate (ADVICE r4): after
    SPARSE_FAIL_DISABLE_AFTER in a row the detector logs at ERROR level
    and disables sparse for the session, so a permanently broken sparse
    path is distinguishable from one-off tunnel flakes; every fallback
    still returns the bit-exact full transfer."""
    import logging

    import oar_ocr_tpu.ops.det_device as dd
    from oar_ocr_tpu.models.detection.detector import DBDetector

    rt = Runtime(RuntimeConfig(det_sparse_fetch="on", use_mesh=False))
    det = DBDetector.__new__(DBDetector)
    det.runtime = rt
    b, h, w = 2, 64, 256
    bitmap = np.zeros((b, h, w), np.uint8)
    bitmap[:, 18:30, 40:200] = (rng.random((b, 12, 160)) < 0.5)
    packed_dev = pack_bits(jnp.asarray(bitmap))
    mask = tile_occupancy_mask(packed_dev)

    def boom(*a, **k):
        raise RuntimeError("remote_compile: body closed")

    monkeypatch.setattr(dd, "gather_occupied_tiles", boom)
    n = DBDetector.SPARSE_FAIL_DISABLE_AFTER
    with caplog.at_level(logging.WARNING,
                         logger="oar_ocr_tpu.models.detection.detector"):
        for _ in range(n):
            out = det._fetch_bitmap(packed_dev, mask, "tile")
            assert np.array_equal(out, np.asarray(packed_dev))
    errors = [r for r in caplog.records if r.levelno >= logging.ERROR]
    assert len(errors) == 1 and "disabling" in errors[0].getMessage()
    assert det._sparse_disabled
    assert rt.degrade_counts["sparse_det_fetch[tile]"] == n

    # a success (fresh detector, working path) resets the streak
    monkeypatch.undo()
    det2 = DBDetector.__new__(DBDetector)
    det2.runtime = rt
    det2._sparse_fail_streak = n - 1
    out = det2._fetch_bitmap(packed_dev, tile_occupancy_mask(packed_dev),
                             "tile")
    assert np.array_equal(out, np.asarray(packed_dev))
    assert det2._sparse_fail_streak == 0

"""Link-policy runtime behaviors (r4 cliff fixes): free h2d bandwidth
observation (no blocking probes), bounded RTT subtraction, periodic
dense recovery while sparse uploads are active."""

import time

import numpy as np
import pytest

pytestmark = pytest.mark.fast

from oar_ocr_tpu.runtime.runtime import Runtime  # noqa: E402


@pytest.fixture()
def rt():
    from oar_ocr_tpu.config.runtime import RuntimeConfig

    return Runtime(RuntimeConfig())


def test_h2d_checkpoint_upward_only_on_loose_bound(rt):
    """A short window only LOWER-bounds bandwidth: it must raise the
    estimate, never drag a healthy one down."""
    rt._h2d_mbps = 500.0
    rt.note_upload_start(16 * 1024 * 1024, time.perf_counter() - 0.1)
    rt.h2d_checkpoint()
    # 16MB/0.1s = 160MB/s < 500 -> loose bound ignored (but refreshed)
    assert rt.h2d_mbps == 500.0

    rt.note_upload_start(64 * 1024 * 1024, time.perf_counter() - 0.05)
    rt.h2d_checkpoint()
    # 64MB/0.05s = 1280MB/s > 500 -> bound raises the estimate
    assert rt.h2d_mbps > 500.0


def test_h2d_checkpoint_measures_when_upload_dominates(rt):
    """A big payload over a long window is upload-dominated: treated as a
    real measurement that CAN lower the EMA (degraded-link switch)."""
    rt._h2d_mbps = 500.0
    rt.note_upload_start(16 * 1024 * 1024, time.perf_counter() - 1.0)
    rt.h2d_checkpoint()
    assert rt.h2d_mbps < 500.0      # ~16 MB/s measured


def test_h2d_checkpoint_one_shot_and_floor(rt):
    rt.note_upload_start(1024, time.perf_counter())   # below 4MB floor
    assert rt._h2d_obs is None
    rt.note_upload_start(8 * 1024 * 1024, time.perf_counter())
    first = rt._h2d_obs
    rt.note_upload_start(32 * 1024 * 1024, time.perf_counter())
    assert rt._h2d_obs is first     # first observation wins
    rt.h2d_checkpoint()
    assert rt._h2d_obs is None
    rt.h2d_checkpoint()             # idempotent when empty


def test_note_d2h_bounded_rtt_subtraction(rt):
    """RTT-dominated fetches must not produce absurd bandwidth readings
    (r4 diag: 9 GB/s EMAs kept the sparse det fetch off on a 10 MB/s
    link). At most 3/4 of the time is attributed to latency."""
    rt.note_rtt(0.1)
    rt.note_d2h(1_200_000, 0.105)   # barely above the RTT
    # payload_s floored at 0.25*0.105 -> <= ~46 MB/s, not multi-GB/s
    assert rt.d2h_mbps < 100.0


def test_sparse_upload_time_based_dense_recovery(monkeypatch):
    """While sparse uploads are active, at most ONE dense upload per
    link_recovery_interval_s re-measures the link (time-based — the
    r4 every-16th COUNT pattern fired a full-price 59 MB dense upload
    every ~6 s of pipelined bench time and cost ~40% of the headline);
    a fresh dense timestamp suppresses the probe entirely."""
    from oar_ocr_tpu.config.runtime import RuntimeConfig
    from oar_ocr_tpu.runtime import page_upload as P

    rt = Runtime(RuntimeConfig(page_upload="auto"))
    rt._h2d_mbps = 5.0              # degraded -> sparse eligible
    rt._h2d_t = time.monotonic()
    pages = [np.full((64, 64, 3), 255, np.uint8) for _ in range(2)]
    pages[0][10:20, 10:40] = 3      # sparse-friendly content

    paths = []
    monkeypatch.setattr(P, "_put_dense",
                        lambda rt_, b: paths.append("dense"))
    monkeypatch.setattr(P, "_put_sparse",
                        lambda rt_, plan, g: paths.append("sparse"))
    monkeypatch.setattr(P, "_put_gray",
                        lambda rt_, b: paths.append("gray"))
    # fresh probe clock (construction time): every upload stays sparse
    for _ in range(32):
        P.upload_pages(rt, pages, (64, 64))
    assert paths and all(p == "sparse" for p in paths)

    # stale clock: exactly ONE dense recovery fires, clock resets, and
    # the following uploads are sparse again
    paths.clear()
    rt._h2d_dense_t -= rt.cfg.link_recovery_interval_s + 1
    for _ in range(4):
        P.upload_pages(rt, pages, (64, 64))
    assert paths == ["dense", "sparse", "sparse", "sparse"]
    assert rt.recovery_counts.get("upload_dense") == 1


def test_d2h_recovery_starvation_gated(rt):
    """The det-side full-fetch probe fires ONLY when the d2h EMA is
    starved: any ≥64 KB fetch landing a note_d2h measurement resets the
    clock, so links whose sparse payloads feed the EMA never pay it."""
    assert not rt.d2h_recovery_due()          # fresh at construction
    rt._d2h_meas_t -= rt.cfg.link_recovery_interval_s + 1
    assert rt.d2h_recovery_due()              # starved -> probe due
    rt.note_rtt(0.001)                        # tiny fetch: no measurement
    assert rt.d2h_recovery_due()
    rt.note_d2h(1 << 20, 0.05)                # >=64 KB measurement lands
    assert not rt.d2h_recovery_due()


def test_d2h_probe_issuance_resets_clock(rt):
    """A fired probe resets the clock at ISSUANCE: small det buckets
    pack under note_d2h's 64 KB floor, and without the reset the
    at-most-one-per-interval probe would fire on every batch."""
    rt._d2h_meas_t -= rt.cfg.link_recovery_interval_s + 1
    assert rt.d2h_recovery_due()
    rt.note_d2h_probe()                       # probe issued
    assert not rt.d2h_recovery_due()          # next batch: no probe
    rt.note_d2h(32 * 1024, 0.01)              # sub-floor full fetch
    assert not rt.d2h_recovery_due()


def test_gray_upload_resets_h2d_probe_clock(monkeypatch):
    """_put_gray is a full-size (1/3) transfer — a real link
    measurement — so it must reset the dense-probe clock like
    _put_dense does (otherwise an hour of healthy gray traffic is
    followed by a pointless full-price dense probe)."""
    from oar_ocr_tpu.config.runtime import RuntimeConfig
    from oar_ocr_tpu.runtime import page_upload as P

    rt2 = Runtime(RuntimeConfig(page_upload="on"))
    rt2._h2d_dense_t -= rt2.cfg.link_recovery_interval_s + 1
    g = np.random.default_rng(0).integers(0, 255, (96, 64, 1),
                                          dtype=np.uint8)
    P.upload_pages(rt2, [np.repeat(g, 3, axis=2)], (96, 64))
    assert not rt2.h2d_recovery_due()


def test_no_keepalive_thread_on_cpu():
    import threading

    from oar_ocr_tpu.config.runtime import RuntimeConfig

    Runtime(RuntimeConfig())
    names = [t.name for t in threading.enumerate()]
    assert "oar-link-keepalive" not in names


def test_io_submit_retries_transient_failure(rt):
    """One transient tunnel read error on the link thread is retried
    (the device array is still alive); the retry's value surfaces."""
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("read body: response body closed")
        return 42

    assert rt.io_submit(flaky).result() == 42
    assert len(calls) == 2
    assert rt.link_retry_count == 1


def test_io_submit_deterministic_error_not_retried(rt):
    """A deterministic failure (shape bug, OOM — not a known transient
    tunnel signature) must surface immediately: re-running the whole
    fetch would re-run sparse attempt + full fallback and demote the
    first occurrence to a warning (ADVICE r4)."""
    calls = []

    def shape_bug():
        calls.append(1)
        raise ValueError("cannot reshape array of size 7 into (2, 4)")

    with pytest.raises(ValueError, match="reshape"):
        rt.io_submit(shape_bug).result()
    assert len(calls) == 1
    assert rt.link_retry_count == 0


def test_io_submit_double_failure_surfaces(rt):
    """A persistent failure still surfaces at Future.result() so the
    callers' fallback ladders engage."""
    def dead():
        raise RuntimeError("link down")

    with pytest.raises(RuntimeError, match="link down"):
        rt.io_submit(dead).result()

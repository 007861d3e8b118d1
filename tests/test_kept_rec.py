"""Kept-only rec CTC transfer (ops/ctc.gather_kept_ctc + recognizer
merge/collect kept mode).

On degraded d2h links the merged rec fetch ships only the KEPT timesteps
(count + columns + 6-byte entries) at a speculative budget — the
dictionary decoder reads nothing else, so the transfer is decode-lossless
by construction. Contract: pipeline outputs are IDENTICAL to the full
transfer (rec_kept_fetch="off"), including word-box columns, and a
too-small budget refetches the full array rather than truncating text.
"""

from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from oar_ocr_tpu.config.runtime import RuntimeConfig  # noqa: E402
from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder  # noqa: E402
from oar_ocr_tpu.runtime.runtime import Runtime  # noqa: E402


@pytest.fixture(scope="module")
def det_params():
    from oar_ocr_tpu.runtime.weights import load_params

    tree = load_params(str(Path(__file__).resolve().parents[1]
                           / "assets" / "bench_det.safetensors"))
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tree)


def _page(rng, h=256, w=320, bars=3):
    page = np.full((h, w, 3), 255, np.uint8)
    for r in range(bars):
        page[30 + 70 * r : 54 + 70 * r, 20:250] = rng.integers(0, 60)
    return page


def _key(res):
    return [
        (np.asarray(r.box).tolist(), r.text,
         round(r.confidence or 0.0, 6),
         [np.asarray(b).tolist() for b in (r.word_boxes or [])])
        for r in res.regions
    ]


def _build(det_params, mode):
    rt = Runtime(RuntimeConfig(rec_kept_fetch=mode, use_mesh=False))
    return (OAROCRBuilder("general").with_runtime(rt)
            .with_det_params(det_params)
            .with_batch_sizes(image=2, region=16).build())


def test_kept_matches_full(det_params, rng):
    pages = [_page(rng), _page(rng, 250, 300, bars=2)]
    full = [_key(r) for r in _build(det_params, "off").predict(pages)]
    pipe = _build(det_params, "on")
    # two predicts: the first budgets t//2 (no history) and seeds the
    # kept-count history; the second uses the speculative budget
    for _ in range(2):
        kept = [_key(r) for r in pipe.predict(pages)]
        assert kept == full
    assert getattr(pipe.recognizer, "_kept_hist", {}), "history not seeded"


def test_kept_overflow_refetches(det_params, rng):
    """A sabotaged (too-small) budget must refetch the full transfer and
    still produce identical outputs — never truncated text."""
    pages = [_page(rng)]
    full = [_key(r) for r in _build(det_params, "off").predict(pages)]
    pipe = _build(det_params, "on")
    pipe.recognizer._kept_budget = lambda t: 1   # force overflow
    kept = [_key(r) for r in pipe.predict(pages)]
    assert kept == full
    # an expected budget miss is an OVERFLOW, never a degradation
    # (degrade_counts is reserved for unplanned tunnel/compile failures)
    assert pipe.runtime.overflow_counts.get("kept_rec", 0) >= 1
    assert "kept_rec_overflow" not in pipe.runtime.degrade_counts


def test_kept_auto_policy():
    rt = Runtime(RuntimeConfig(rec_kept_fetch="auto", use_mesh=False))
    assert not rt.rec_kept_active()              # no estimate yet
    rt.note_rtt(0.001)
    rt.note_d2h(1_000_000, 0.301)                # ~3.3 MB/s
    assert rt.rec_kept_active()
    for _ in range(12):
        rt.note_d2h(1_000_000, 0.002)            # link recovers
    assert not rt.rec_kept_active()
    assert not Runtime(
        RuntimeConfig(rec_kept_fetch="off", use_mesh=False)
    ).rec_kept_active()


def test_kept_gather_failure_degrades_to_full(det_params, rng,
                                              monkeypatch):
    """A transient device/compile failure inside the kept gather
    (observed: a remote-compile tunnel drop on a first-seen budget
    shape) must degrade to the full merge, not kill the predict."""
    import oar_ocr_tpu.ops.ctc as ctc_mod

    pages = [_page(rng)]
    full = [_key(r) for r in _build(det_params, "off").predict(pages)]
    pipe = _build(det_params, "on")

    def boom(*a, **k):
        raise RuntimeError("remote_compile: response body closed")

    monkeypatch.setattr(ctc_mod, "gather_kept_ctc", boom)
    kept = [_key(r) for r in pipe.predict(pages)]
    assert kept == full

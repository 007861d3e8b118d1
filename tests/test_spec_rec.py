"""Speculative det→rec dispatch (pipelines/ocr.py _consume_spec).

Recognition launches on the score-FREE candidate geometry so the device
score fetch (one tunnel RTT) leaves the predict critical path; the
box_thresh filter applies at assembly, discarding the rec output of
rejected candidates. The contract: outputs are IDENTICAL to the
non-speculative path (OAR_TPU_NO_SPEC_REC=1), including when the filter
actually drops candidates.
"""

from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder  # noqa: E402


@pytest.fixture(scope="module")
def det_params():
    from oar_ocr_tpu.runtime.weights import load_params

    tree = load_params(str(Path(__file__).resolve().parents[1]
                           / "assets" / "bench_det.safetensors"))
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tree)


def _page(rng, h=256, w=320, strong=3, weak=2):
    """Strong dark bars (high det score) + faint bars that land between
    box_thresh settings, so a raised threshold filters some candidates."""
    page = np.full((h, w, 3), 255, np.uint8)
    for r in range(strong):
        page[30 + 70 * r : 54 + 70 * r, 20:250] = rng.integers(0, 60)
    for r in range(weak):
        page[58 + 70 * r : 64 + 70 * r, 40:140] = 200
    return page


def _key(res):
    return [
        (np.asarray(r.box).tolist(), r.text, round(r.confidence or 0.0, 6),
         round(r.det_score or 0.0, 6))
        for r in res.regions
    ]


@pytest.mark.parametrize("box_thresh", [0.3, 0.6])
def test_spec_matches_nonspec(det_params, box_thresh, monkeypatch, rng):
    pages = [_page(rng), _page(rng, 250, 300, strong=2, weak=3)]

    def build():
        return (OAROCRBuilder("general")
                .with_det_config(box_thresh=box_thresh)
                .with_det_params(det_params)
                .with_batch_sizes(image=1, region=16).build())

    monkeypatch.delenv("OAR_TPU_NO_SPEC_REC", raising=False)
    pipe = build()
    spec_geoms = []
    orig = type(pipe.detector).finalize_geometry
    monkeypatch.setattr(
        type(pipe.detector), "finalize_geometry",
        lambda self, pending: spec_geoms.append(1) or orig(self, pending))
    res_spec = [_key(r) for r in pipe.predict(pages)]
    assert spec_geoms, "speculative path did not engage"

    monkeypatch.setenv("OAR_TPU_NO_SPEC_REC", "1")
    res_plain = [_key(r) for r in build().predict(pages)]
    assert res_spec == res_plain


def test_spec_filter_actually_drops(det_params, monkeypatch, rng):
    """Some candidates must be recognized then dropped — the remap path
    (texts/word-box renumbering) is exercised for real, not vacuously.
    Deterministic: the score fetch is patched to zero every 2nd
    candidate's score, below box_thresh on both paths."""
    from oar_ocr_tpu.models.detection.detector import DBDetector

    page = _page(rng)

    def build():
        return (OAROCRBuilder("general")
                .with_det_config(box_thresh=0.6)
                .with_det_params(det_params)
                .with_batch_sizes(image=1, region=16).build())

    monkeypatch.delenv("OAR_TPU_NO_SPEC_REC", raising=False)
    n_all = len(build().predict([page])[0].regions)
    assert n_all >= 2

    orig = DBDetector._fetch_scores

    def patched(self, dev, k):
        s = orig(self, dev, k).copy()
        s[::2] = 0.0
        return s

    monkeypatch.setattr(DBDetector, "_fetch_scores", patched)
    res_spec = [_key(r) for r in build().predict([page])]
    assert 0 < len(res_spec[0]) < n_all

    monkeypatch.setenv("OAR_TPU_NO_SPEC_REC", "1")
    res_plain = [_key(r) for r in build().predict([page])]
    assert res_spec == res_plain


def test_spec_scores_failure_degrades_to_empty(det_params, monkeypatch, rng):
    """A dead scores fetch after speculative recognition must yield empty
    page results with a warning, not a raised predict (the terminal state
    of the non-speculative fallback ladder)."""
    from oar_ocr_tpu.models.detection.detector import DBDetector

    monkeypatch.delenv("OAR_TPU_NO_SPEC_REC", raising=False)
    pipe = (OAROCRBuilder("general")
            .with_det_params(det_params)
            .with_batch_sizes(image=1, region=16).build())

    def boom(self, dev, k):
        raise RuntimeError("link died")

    monkeypatch.setattr(DBDetector, "_fetch_scores", boom)
    res = pipe.predict([_page(rng)])
    assert len(res) == 1 and res[0].regions == []

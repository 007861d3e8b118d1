"""End-to-end pipeline smoke tests with random-init weights.

Mirrors the reference's tiny-image pipeline-invariant tests (SURVEY §4) —
no real model weights needed; asserts plumbing, shapes, ordering, and that
every stage composes on the CPU backend.
"""

import numpy as np
import pytest

from oar_ocr_tpu.errors import InvalidInputError
from oar_ocr_tpu.pipelines.ocr import OAROCR, OAROCRBuilder, TEXT_TYPE_PRESETS


@pytest.fixture(scope="module")
def pipeline():
    return (OAROCRBuilder("general")
            .with_batch_sizes(image=2, region=8)
            .build())


def _doc_image(rng, h=200, w=300):
    """White page with dark text-like bars (detectable by any net is not
    guaranteed with random weights — we only assert plumbing)."""
    img = np.full((h, w, 3), 255, np.uint8)
    img[40:60, 30:200] = 20
    img[100:118, 30:260] = 20
    return img


def test_predict_returns_results(pipeline, rng):
    imgs = [_doc_image(rng), _doc_image(rng, 160, 240)]
    results = pipeline.predict(imgs)
    assert len(results) == 2
    assert results[0].width == 300 and results[0].height == 200
    for res in results:
        for region in res.regions:
            assert region.text is not None
            assert 0.0 <= (region.confidence or 0.0) <= 1.0
            assert region.box.shape[-1] == 2


def test_predict_empty(pipeline):
    assert pipeline.predict([]) == []


def test_predict_paths(pipeline, rng, tmp_path):
    """Path-based entry: threaded decode → predict, source_path stamped
    (ocr.rs predict_path surface)."""
    import cv2

    p = tmp_path / "page.png"
    cv2.imwrite(str(p), _doc_image(rng)[..., ::-1])
    results = pipeline.predict_paths([str(p)])
    assert len(results) == 1
    assert results[0].source_path == str(p)
    assert results[0].width == 300 and results[0].height == 200


def test_predict_rejects_bad_input(pipeline):
    with pytest.raises(InvalidInputError):
        pipeline.predict([np.zeros((10, 10), np.uint8)])
    with pytest.raises(InvalidInputError):
        pipeline.predict([np.zeros((10, 10, 3), np.float32)])


def test_text_type_presets():
    assert set(TEXT_TYPE_PRESETS) == {"general", "table", "seal"}
    b = OAROCRBuilder("table")
    assert b._det_post.box_thresh == 0.4
    s = OAROCRBuilder("seal")
    assert s._det_resize.limit_side_len == 736
    with pytest.raises(InvalidInputError):
        OAROCRBuilder("bogus")


def test_builder_config_overrides():
    b = (OAROCRBuilder("general")
         .with_det_config(box_thresh=0.55, limit_side_len=640)
         .with_charset(["a", "b", "c"]))
    assert b._det_post.box_thresh == 0.55
    assert b._det_resize.limit_side_len == 640
    p = b.build()
    assert p.recognizer.decoder.vocab_size == 5  # 3 chars + space + blank


def test_detector_standalone(pipeline, rng):
    imgs = [_doc_image(rng)]
    out = pipeline.detector.detect_images(imgs)
    assert len(out) == 1
    boxes, scores = out[0]
    assert len(boxes) == len(scores)
    for b in boxes:
        assert b[:, 0].max() <= 300 and b[:, 1].max() <= 200


def test_pipeline_with_preprocessing_and_lineori(rng):
    pipe = (OAROCRBuilder("general")
            .with_doc_orientation()
            .with_textline_orientation()
            .with_det_config(box_thresh=0.05, thresh=0.45)
            .with_batch_sizes(image=2, region=8)
            .build())
    imgs = [_doc_image(rng)]
    results = pipe.predict(imgs)
    assert len(results) == 1
    res = results[0]
    assert res.orientation_angle in (0, 90, 180, 270)
    for region in res.regions:
        assert region.orientation_angle in (0, 180)


def test_server_backbone_variants():
    """PP-HGNetV2 server backbone builds and runs through the wrappers."""
    import jax.numpy as jnp

    from oar_ocr_tpu.models.detection.db import DBNet
    from oar_ocr_tpu.models.hgnet import PPHGNetV2
    from oar_ocr_tpu.runtime.runtime import init_params

    m = DBNet(backbone="hgnet")
    p = init_params(m, (1, 64, 64, 3))
    out = m.apply(p, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64)

    bb = PPHGNetV2(mode="cls")
    pc = init_params(bb, (1, 64, 64, 3))
    feat = bb.apply(pc, jnp.zeros((1, 64, 64, 3)))
    assert feat.ndim == 2


def test_det_fallback_ladder(pipeline, rng, monkeypatch):
    """A failing batched detection degrades to per-image, then to empty
    results — the reference's fallback ladder (ocr.rs:576-588)."""
    img = _doc_image(rng)
    calls = {"n": 0}
    orig = type(pipeline.detector).collect_candidates

    def flaky(self, handle):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected batch failure")
        return orig(self, handle)

    monkeypatch.setattr(type(pipeline.detector), "collect_candidates", flaky)
    results = pipeline.predict([img])
    assert len(results) == 1            # degraded, not raised
    assert calls["n"] >= 2              # retried per-image

    def always_fail(self, handle):
        raise RuntimeError("injected total failure")

    monkeypatch.setattr(type(pipeline.detector), "collect_candidates", always_fail)
    monkeypatch.setattr(type(pipeline.detector), "detect",
                        lambda self, *a, **k: (_ for _ in ()).throw(
                            RuntimeError("fail")))
    results = pipeline.predict([img])
    assert results[0].regions == []     # empty page result, no exception


def test_oversized_page_is_downscaled(rng):
    """Pages beyond max_side_len must not crash stack_padded (ADVICE r1
    medium): they are downscaled on host and boxes come back in the
    input frame."""
    pipe = (OAROCRBuilder("general")
            .with_batch_sizes(image=1, region=8)
            .build())
    pipe.cfg.max_side_len = 256
    img = _doc_image(rng, h=400, w=600)   # > 256 on both sides
    results = pipe.predict([img])
    assert len(results) == 1
    assert results[0].width == 600 and results[0].height == 400
    for region in results[0].regions:
        assert region.box[:, 0].max() <= 600
        assert region.box[:, 1].max() <= 400


def test_with_source_bytes_and_path(tmp_path, rng):
    """Builder accepts ModelSource path|bytes (model_source.rs:21-28):
    weights round-trip through an in-memory safetensors blob and a file
    path, and the loaded pipeline produces identical det params."""
    from safetensors.numpy import save, save_file

    from oar_ocr_tpu.runtime.weights import ModelSource, flatten_params

    base = OAROCRBuilder("general").with_batch_sizes(image=1, region=4)
    pipe0 = base.build()
    flat = flatten_params(pipe0.detector.params)
    blob = save(flat)
    p = tmp_path / "det.safetensors"
    save_file(flat, str(p))

    pipe_b = (OAROCRBuilder("general")
              .with_det_source(ModelSource.from_bytes(blob))
              .with_batch_sizes(image=1, region=4).build())
    pipe_p = (OAROCRBuilder("general")
              .with_det_source(str(p))
              .with_batch_sizes(image=1, region=4).build())
    f0 = flatten_params(pipe0.detector.params)
    for name, arr in flatten_params(pipe_b.detector.params).items():
        np.testing.assert_array_equal(arr, f0[name])
    for name, arr in flatten_params(pipe_p.detector.params).items():
        np.testing.assert_array_equal(arr, f0[name])


def test_result_convenience_accessors():
    """result.rs:53-98 helper surface."""
    from oar_ocr_tpu.domain.text_region import OAROCRResult, TextRegion

    res = OAROCRResult(regions=[
        TextRegion(box=np.zeros((4, 2), np.float32), text="hello",
                   confidence=0.9),
        TextRegion(box=np.zeros((4, 2), np.float32), text=None),
        TextRegion(box=np.zeros((4, 2), np.float32), text="world",
                   confidence=0.7),
    ], width=10, height=10)
    assert res.all_text() == ["hello", "world"]
    assert res.concatenated_text(" ") == "hello world"
    assert res.recognized_text_count() == 2
    assert abs(res.average_confidence() - 0.8) < 1e-6
    assert len(res.confident_text_regions()) == 2
    assert "hello" in str(res)
    assert OAROCRResult().average_confidence() is None
    # has_text() is text.is_some(): an EMPTY recognized string counts
    # (text_region.rs:98 counts Some(""))
    res.regions.append(TextRegion(box=np.zeros((4, 2), np.float32),
                                  text="", confidence=0.2))
    assert res.recognized_text_count() == 3
    assert res.all_text() == ["hello", "world", ""]
    assert abs(res.average_confidence() - 0.6) < 1e-6


def test_predict_with_preuploaded_pages(pipeline, rng):
    """predict(pages_dev=...) — the shared-upload entry OARStructure uses
    (VERDICT r3 item 2) — must match a plain predict exactly and must not
    re-upload any page."""
    from oar_ocr_tpu.runtime.runtime import Runtime

    imgs = [_doc_image(rng), _doc_image(rng, 160, 240), _doc_image(rng)]
    base = pipeline.predict(imgs)

    shapes = [im.shape[:2] for im in imgs]
    cfg = pipeline.runtime.cfg
    ph = cfg.det_side_buckets.bucket(max(s[0] for s in shapes))
    pw = cfg.det_side_buckets.bucket(max(s[1] for s in shapes))
    pages = pipeline.runtime.put_pages(imgs, (ph, pw))

    calls = []
    orig = Runtime.put_pages

    def counted(self, images, hw):
        calls.append(len(images))
        return orig(self, images, hw)

    try:
        Runtime.put_pages = counted
        shared = pipeline.predict(imgs, pages_dev=pages)
    finally:
        Runtime.put_pages = orig

    assert calls == [], "pages_dev path must not re-upload"
    assert len(shared) == len(base)
    for a, b in zip(shared, base):
        assert len(a.regions) == len(b.regions)
        for ra, rb in zip(a.regions, b.regions):
            np.testing.assert_allclose(ra.box, rb.box, atol=1e-4)
            assert ra.text == rb.text

"""Sparse page upload (runtime/page_upload.py): on a degraded h2d link
the padded uint8 page batch ships grayscale-collapsed and/or as
non-constant 32x32 tiles, and the device-side reassembly must be
BIT-IDENTICAL to ``stack_padded`` + ``device_put`` — every downstream
stage (det sampler, rec warp gather) reads this buffer."""

import numpy as np
import pytest

from oar_ocr_tpu.config.runtime import RuntimeConfig
from oar_ocr_tpu.runtime import page_upload
from oar_ocr_tpu.runtime.runtime import Runtime, stack_padded

pytestmark = pytest.mark.fast


def _rt(mode="on", **kw):
    return Runtime(RuntimeConfig(page_upload=mode, use_mesh=False, **kw))


def _doc_pages(rng, n=3, gray=True, hw=(200, 150)):
    pages = []
    for i in range(n):
        h, w = hw[0] + 10 * i, hw[1] + 6 * i
        img = np.full((h, w, 3), 255, np.uint8)
        for r in range(4):
            y = 20 + r * 40
            v = rng.integers(0, 60, (28, w - 60, 1 if gray else 3),
                             dtype=np.uint8)
            img[y:y + 28, 30:w - 30] = v
        pages.append(img)
    return pages


def _expected(images, hw):
    return stack_padded(list(images), hw)


@pytest.mark.parametrize("gray", [True, False])
def test_sparse_bit_exact(rng, gray):
    pages = _doc_pages(rng, gray=gray)
    hw = (256, 192)
    out = np.asarray(page_upload.upload_pages(_rt("on"), pages, hw))
    assert out.dtype == np.uint8
    assert np.array_equal(out, _expected(pages, hw))


def test_all_background_page(rng):
    pages = [np.full((100, 80, 3), 255, np.uint8)]
    hw = (128, 96)
    out = np.asarray(page_upload.upload_pages(_rt("on"), pages, hw))
    assert np.array_equal(out, _expected(pages, hw))


def test_dense_content_falls_back_dense(rng):
    """Random pages: no constant tiles → the byte-ratio guard keeps the
    dense transfer, still exact."""
    pages = [rng.integers(0, 255, (96, 64, 3), dtype=np.uint8)
             for _ in range(2)]
    hw = (96, 64)
    out = np.asarray(page_upload.upload_pages(_rt("on"), pages, hw))
    assert np.array_equal(out, _expected(pages, hw))


def test_gray_random_uses_gray_collapse(rng):
    """Grayscale but dense content → the R==G==B collapse still applies
    (1/3 bytes) and reconstructs exactly."""
    g = rng.integers(0, 255, (96, 64, 1), dtype=np.uint8)
    pages = [np.repeat(g, 3, axis=2)]
    hw = (96, 64)
    out = np.asarray(page_upload.upload_pages(_rt("on"), pages, hw))
    assert np.array_equal(out, _expected(pages, hw))


def test_unaligned_bucket_uses_dense(rng):
    pages = [np.full((50, 40, 3), 255, np.uint8)]
    pages[0][10:30, 5:35] = 17
    hw = (70, 50)  # not multiples of 32
    out = np.asarray(page_upload.upload_pages(_rt("on"), pages, hw))
    assert np.array_equal(out, _expected(pages, hw))


def test_mode_off_is_dense_put(rng, monkeypatch):
    rt = _rt("off")
    called = {}
    monkeypatch.setattr(page_upload, "_analyze",
                        lambda *a: called.setdefault("analyze", True))
    pages = _doc_pages(rng, n=1)
    out = np.asarray(page_upload.upload_pages(rt, pages, (256, 192)))
    assert "analyze" not in called
    assert np.array_equal(out, _expected(pages, (256, 192)))


def test_auto_policy_follows_h2d_ema(rng, monkeypatch):
    rt = _rt("auto", upload_sparse_bw_mbps=150.0)
    seen = []
    real = page_upload._analyze
    monkeypatch.setattr(page_upload, "_analyze",
                        lambda b: seen.append(1) or real(b))
    real_nat = page_upload._native_plan
    monkeypatch.setattr(page_upload, "_native_plan",
                        lambda *a: seen.append(1) or real_nat(*a))
    pages = _doc_pages(rng, n=1)
    hw = (256, 192)
    # no estimate yet → dense (and the first upload feeds the EMA)
    out = np.asarray(page_upload.upload_pages(rt, pages, hw))
    assert not seen
    assert np.array_equal(out, _expected(pages, hw))
    # slow link → sparse path engages
    rt._h2d_mbps = 5.0
    monkeypatch.setattr(rt, "h2d_stale", lambda s: False)
    out = np.asarray(page_upload.upload_pages(rt, pages, hw))
    assert seen
    assert np.array_equal(out, _expected(pages, hw))
    # healthy link → back to dense
    seen.clear()
    rt._h2d_mbps = 900.0
    out = np.asarray(page_upload.upload_pages(rt, pages, hw))
    assert not seen


def test_note_h2d_ema_and_staleness():
    rt = _rt("auto")
    assert rt.h2d_stale(45.0)
    rt.note_rtt(0.001)
    rt.note_h2d(10_000_000, 0.101)      # ~100 MB/s
    assert rt.h2d_mbps == pytest.approx(100.0, rel=0.02)
    assert not rt.h2d_stale(45.0)
    rt.note_h2d(10_000_000, 0.011)      # ~1 GB/s sample moves the EMA up
    assert rt.h2d_mbps > 300.0


def test_predict_sparse_matches_dense(rng):
    """Pipeline-level equality: OAROCR.predict with forced sparse upload
    returns identical boxes/texts to the dense upload."""
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder

    img = np.full((240, 320, 3), 255, np.uint8)
    img[40:70, 30:290] = rng.integers(0, 60)
    img[120:150, 30:160] = rng.integers(0, 60)

    def run(mode):
        rt = Runtime(RuntimeConfig(page_upload=mode, use_mesh=False))
        pipe = (OAROCRBuilder("general").with_runtime(rt)
                .with_det_config(box_thresh=0.05, thresh=0.45).build())
        return pipe.predict([img, img.copy()])

    dense = run("off")
    sparse = run("on")
    assert len(dense) == len(sparse) == 2
    for d, s in zip(dense, sparse):
        assert len(d.regions) == len(s.regions)
        for rd, rs in zip(d.regions, s.regions):
            assert np.allclose(rd.box, rs.box)
            assert rd.text == rs.text
            assert rd.confidence == pytest.approx(rs.confidence)


def _text_pages(n=3, hw=(256, 320)):
    """Hard-edged two-value blocks on flat background: every occupied
    tile is exactly bilevel (the split's target content class)."""
    pages = []
    for i in range(n):
        img = np.full((hw[0] - 8 * i, hw[1] - 8 * i, 3), 255, np.uint8)
        img[40:70, 30:200] = [20, 60, 90]
        img[100:130, 50:250] = 5
        img[160:190, 20:140] = [200, 10, 10]
        pages.append(img)
    return pages


def test_bilevel_split_bit_exact(rng):
    """Text-on-flat-background tiles take the BILEVEL packed path
    (1 bit/px + 2 colors) and must reconstruct bit-identically — for
    RGB, grayscale, and mixed (noise region forces a dense group)."""
    hw = (256, 320)
    # rgb text blocks
    out = np.asarray(page_upload.upload_pages(_rt("on"),
                                              _text_pages(), hw))
    assert np.array_equal(out, _expected(_text_pages(), hw))
    # mixed: one noisy (dense-group) region + text blocks
    pages = _text_pages(n=1)
    pages[0][:64, :64] = rng.integers(0, 255, (64, 64, 3), np.uint8)
    out = np.asarray(page_upload.upload_pages(_rt("on"), pages, hw))
    assert np.array_equal(out, _expected(pages, hw))
    # antialiased edges (3 values/tile) must land in the dense group
    pages = [np.full((128, 128, 3), 255, np.uint8)]
    pages[0][30:60, 20:100] = 0
    pages[0][29, 20:100] = 128
    out = np.asarray(page_upload.upload_pages(_rt("on"), pages,
                                              (128, 128)))
    assert np.array_equal(out, _expected(pages, (128, 128)))


def test_bilevel_split_payload_and_fallbacks():
    """The split plan must undercut the raw-tile plan by a wide margin
    on bilevel content, decline when too few tiles qualify, and its
    packed-bit reconstruction must match the raw tiles exactly."""
    batch = stack_padded(_text_pages(), (256, 320))
    plan = page_upload._analyze(batch)
    split = page_upload._split_bilevel(plan)
    assert split is not None
    assert split[-1] < 0.4 * plan[3]
    # few bilevel tiles → split declines (single-group plan kept)
    rng = np.random.default_rng(0)
    noisy = [rng.integers(0, 255, (96, 64, 3), dtype=np.uint8)]
    nbatch = stack_padded(noisy, (96, 64))
    nplan = page_upload._analyze(nbatch)
    assert (nplan is None
            or page_upload._split_bilevel(nplan) is None)


def _dense_text_page(hw=(512, 640)):
    """Text lines every 12 px: nearly every tile occupied but bilevel —
    the high-occupancy rescue's target content."""
    img = np.full(hw + (3,), 255, np.uint8)
    for y in range(6, hw[0] - 12, 12):
        img[y:y + 8, 8:hw[1] - 8] = 15
    return img


def test_high_occupancy_text_rescued(rng):
    """Occupancy above the raw bucket cap used to force the full dense
    transfer; bilevel content now proceeds at full occupancy (sampled
    gate) and ships ~15x fewer bytes, bit-exactly."""
    rt = _rt("on")
    pages = [_dense_text_page() for _ in range(2)]
    hw = (512, 640)
    plan = page_upload._analyze(stack_padded(pages, hw))
    assert plan is not None          # rescued past the bucket cap
    h2d0 = rt.h2d_bytes_total
    out = np.asarray(page_upload.upload_pages(rt, pages, hw))
    ref = _expected(pages, hw)
    assert np.array_equal(out, ref)
    assert rt.h2d_bytes_total - h2d0 < 0.4 * ref.nbytes


def test_high_occupancy_noise_stays_dense(rng):
    """Same occupancy, non-bilevel content: the sampled gate fails and
    the upload stays dense (no wasted full gather)."""
    pages = [rng.integers(0, 255, (512, 640, 3), dtype=np.uint8)]
    assert page_upload._analyze(stack_padded(pages, (512, 640))) is None
    out = np.asarray(page_upload.upload_pages(_rt("on"), pages,
                                              (512, 640)))
    assert np.array_equal(out, _expected(pages, (512, 640)))


def test_bilevel_failure_degrades_to_dense(monkeypatch):
    """A tunnel flake inside the bilevel scatter program degrades to the
    dense transfer (full-transfer ladder), bit-identically."""
    rt = _rt("on")
    pages = _text_pages(n=2)
    expect = _expected(pages, (256, 320))

    def boom(*a, **k):
        raise RuntimeError("remote_compile: body closed")

    monkeypatch.setattr(page_upload, "_put_sparse", boom)
    out = page_upload.upload_pages(rt, pages, (256, 320))
    assert np.array_equal(np.asarray(out), expect)
    assert rt.degrade_counts.get("sparse_upload") == 1


def test_sparse_upload_failure_degrades_to_dense(monkeypatch):
    """A transient device/compile failure inside the sparse or gray
    upload programs (observed: a remote-compile tunnel drop) must
    degrade to the dense upload, not kill the predict."""
    import oar_ocr_tpu.runtime.page_upload as pu
    from oar_ocr_tpu.config.runtime import RuntimeConfig
    from oar_ocr_tpu.runtime.runtime import Runtime, stack_padded

    rt = Runtime(RuntimeConfig(page_upload="on", use_mesh=False))
    rng = np.random.default_rng(3)
    pages = [np.full((64, 96, 3), 250, np.uint8) for _ in range(2)]
    pages[0][10:20, 10:40] = rng.integers(0, 60, (10, 30, 3))
    expect = stack_padded(pages, (64, 96))

    def boom(*a, **k):
        raise RuntimeError("remote_compile: body closed")

    monkeypatch.setattr(pu, "_put_sparse", boom)
    monkeypatch.setattr(pu, "_put_gray", boom)
    out = pu.upload_pages(rt, pages, (64, 96))
    assert np.array_equal(np.asarray(out), expect)
    assert rt.degrade_counts.get("sparse_upload") == 1


def test_gray_upload_failure_degrades_to_dense(monkeypatch):
    """The GRAY fallback branch specifically (ADVICE r4 medium): pages
    with channel-EQUAL dense noise take the gray-collapse path (no
    sparse win — no constant tiles); a failure inside ``_put_gray`` must
    repeat the (B, H, W, 1) batch back to RGB and ship dense,
    bit-identically."""
    import oar_ocr_tpu.runtime.page_upload as pu
    from oar_ocr_tpu.config.runtime import RuntimeConfig
    from oar_ocr_tpu.runtime.runtime import Runtime, stack_padded

    rt = Runtime(RuntimeConfig(page_upload="on", use_mesh=False))
    rng = np.random.default_rng(7)
    g = rng.integers(0, 255, (64, 96, 1), dtype=np.uint8)
    pages = [np.repeat(g, 3, axis=2),
             np.repeat(rng.integers(0, 255, (60, 90, 1), dtype=np.uint8),
                       3, axis=2)]
    expect = stack_padded(pages, (64, 96))

    calls = {"gray": 0}

    def boom(*a, **k):
        calls["gray"] += 1
        raise RuntimeError("remote_compile: body closed")

    monkeypatch.setattr(pu, "_put_gray", boom)
    out = pu.upload_pages(rt, pages, (64, 96))
    assert calls["gray"] == 1, "gray branch was never exercised"
    assert np.array_equal(np.asarray(out), expect)
    assert rt.degrade_counts.get("gray_upload") == 1

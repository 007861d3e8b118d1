"""Serving engine: micro-batching, deadlines, isolation, shutdown."""

import threading
import time

import numpy as np
import pytest

from oar_ocr_tpu.errors import InvalidInputError
from oar_ocr_tpu.serving import ServingConfig, ServingEngine


class RecordingPipeline:
    """Fake pipeline: result = per-image checksum; records batch sizes."""

    def __init__(self, delay_s: float = 0.0, fail_on=None):
        self.batches = []
        self.delay_s = delay_s
        self.fail_on = fail_on        # image checksum that raises

    def predict(self, images):
        self.batches.append(len(images))
        if self.delay_s:
            time.sleep(self.delay_s)
        out = []
        for im in images:
            key = int(im.sum())
            if self.fail_on is not None and key == self.fail_on:
                raise ValueError(f"poison image {key}")
            out.append(key)
        return out


def _img(fill):
    return np.full((4, 4, 3), fill, np.uint8)


def test_results_match_and_coalesce():
    pipe = RecordingPipeline(delay_s=0.02)
    with ServingEngine(pipe, ServingConfig(max_batch_size=8,
                                           max_wait_ms=20)) as eng:
        handles = [eng.submit(_img(i)) for i in range(16)]
        results = [h.result(timeout=10) for h in handles]
    assert results == [int(_img(i).sum()) for i in range(16)]
    # the first predict blocks the worker while the rest queue up, so at
    # least one later batch must coalesce multiple requests
    assert sum(pipe.batches) == 16
    assert max(pipe.batches) > 1
    assert all(b <= 8 for b in pipe.batches)


def test_single_request_honors_deadline():
    pipe = RecordingPipeline()
    with ServingEngine(pipe, ServingConfig(max_wait_ms=10)) as eng:
        t0 = time.perf_counter()
        res = eng.predict(_img(3), timeout=5)
        dt = time.perf_counter() - t0
    assert res == int(_img(3).sum())
    assert dt < 2.0                     # did not wait for a full batch


def test_poison_request_is_isolated():
    poison = int(_img(7).sum())
    pipe = RecordingPipeline(fail_on=poison)
    with ServingEngine(pipe, ServingConfig(max_batch_size=4,
                                           max_wait_ms=50)) as eng:
        # hold the worker busy so all three land in one batch
        blocker = eng.submit(_img(0))
        time.sleep(0.01)
        good1 = eng.submit(_img(5))
        bad = eng.submit(_img(7))
        good2 = eng.submit(_img(9))
        assert blocker.result(5) == 0
        assert good1.result(5) == int(_img(5).sum())
        assert good2.result(5) == int(_img(9).sum())
        with pytest.raises(ValueError, match="poison"):
            bad.result(5)
    assert eng.stats()["failures"] == 1


def test_validation_rejects_bad_input():
    with ServingEngine(RecordingPipeline()) as eng:
        with pytest.raises(InvalidInputError):
            eng.submit(np.zeros((4, 4), np.uint8))          # no channels
        with pytest.raises(InvalidInputError):
            eng.submit(np.zeros((4, 4, 3), np.float32))     # wrong dtype


def test_concurrent_producers():
    pipe = RecordingPipeline(delay_s=0.005)
    results = {}
    lock = threading.Lock()

    def producer(base):
        with_engine = [eng.submit(_img(base + i)) for i in range(8)]
        for i, h in enumerate(with_engine):
            with lock:
                results[base + i] = h.result(10)

    with ServingEngine(pipe, ServingConfig(max_batch_size=8,
                                           max_wait_ms=10)) as eng:
        threads = [threading.Thread(target=producer, args=(b,))
                   for b in (0, 100, 200)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert len(results) == 24
    for k, v in results.items():
        assert v == int(_img(k).sum())
    stats = eng.stats()
    assert stats["requests"] == 24 and stats["batches"] >= 3


def test_close_rejects_new_work():
    eng = ServingEngine(RecordingPipeline())
    eng.close()
    with pytest.raises(InvalidInputError):
        eng.submit(_img(1))


def test_end_to_end_with_real_pipeline():
    """Engine over the real OAROCR pipeline (CPU backend)."""
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder

    img = np.full((64, 96, 3), 255, np.uint8)
    img[20:34, 10:80] = 20
    pipe = (OAROCRBuilder("general")
            .with_det_config(thresh=0.48, box_thresh=0.0)
            .with_batch_sizes(image=2, region=4).build())
    direct = pipe.predict([img])[0]
    with ServingEngine(pipe, ServingConfig(max_batch_size=2,
                                           max_wait_ms=5)) as eng:
        handles = [eng.submit(img.copy()) for _ in range(3)]
        served = [h.result(timeout=300) for h in handles]
    for res in served:
        assert len(res.regions) == len(direct.regions)
        for a, b in zip(res.regions, direct.regions):
            assert np.allclose(a.box, b.box, atol=1e-4)
            assert a.text == b.text


def test_close_during_inflight_resolves_everything():
    """Shutdown race regression: every accepted request must resolve even
    when close() lands while requests are queued / in flight."""
    pipe = RecordingPipeline(delay_s=0.01)
    eng = ServingEngine(pipe, ServingConfig(max_batch_size=2,
                                            max_wait_ms=2))
    handles = []
    errors = []

    def producer():
        for i in range(20):
            try:
                handles.append(eng.submit(_img(i % 7)))
            except InvalidInputError:
                errors.append(i)    # engine closed mid-stream: acceptable
            time.sleep(0.002)

    t = threading.Thread(target=producer)
    t.start()
    time.sleep(0.03)
    eng.close()
    t.join()
    for h in handles:               # accepted => must resolve, no hangs
        h.result(timeout=10)

import numpy as np
import pytest

from oar_ocr_tpu.core.batch import (DEFAULT_ASPECT_BUCKETS,
                                    AspectRatioBucketing, DynamicBatch,
                                    DynamicBatcher, DynamicBatcherConfig,
                                    PaddingStrategy,
                                    ShapeCompatibilityStrategy)
from oar_ocr_tpu.ops.ctc import pred_reverse

pytestmark = pytest.mark.fast


class TestDynamicBatcher:
    def test_exact_grouping(self):
        b = DynamicBatcher(DynamicBatcherConfig(
            strategy=ShapeCompatibilityStrategy.EXACT))
        groups = b.group([(10, 20), (10, 20), (30, 30)])
        assert sorted(map(sorted, groups)) == [[0, 1], [2]]

    def test_max_dimension_grouping(self):
        b = DynamicBatcher(DynamicBatcherConfig(
            strategy=ShapeCompatibilityStrategy.MAX_DIMENSION))
        groups = b.group([(60, 60), (50, 63), (500, 500)])
        assert sorted(map(sorted, groups)) == [[0, 1], [2]]

    def test_aspect_ratio_grouping(self):
        b = DynamicBatcher(DynamicBatcherConfig(
            strategy=ShapeCompatibilityStrategy.ASPECT_RATIO))
        groups = b.group([(32, 320), (32, 310), (100, 100)])
        flat = sorted(map(sorted, groups))
        assert [0, 1] in flat

    def test_max_batch_size_split(self):
        b = DynamicBatcher(DynamicBatcherConfig(
            strategy=ShapeCompatibilityStrategy.EXACT, max_batch_size=2))
        groups = b.group([(8, 8)] * 5)
        assert sorted(len(g) for g in groups) == [1, 2, 2]

    def test_custom_requires_key(self):
        b = DynamicBatcher(DynamicBatcherConfig(
            strategy=ShapeCompatibilityStrategy.CUSTOM,
            custom_key=lambda hw: hw[0] > 100))
        groups = b.group([(50, 50), (200, 10), (150, 5)])
        assert sorted(map(sorted, groups)) == [[0], [1, 2]]

    def test_batch_zero_padding(self, rng):
        imgs = [rng.integers(0, 255, (10, 20, 3), dtype=np.uint8),
                rng.integers(0, 255, (12, 18, 3), dtype=np.uint8)]
        b = DynamicBatcher(DynamicBatcherConfig(
            strategy=ShapeCompatibilityStrategy.MAX_DIMENSION,
            padding=PaddingStrategy.ZERO))
        [batch] = b.batch(imgs)
        assert batch.images.shape[0] == 2
        assert batch.images[0, 15:].max() == 0

    def test_batch_center_padding(self, rng):
        imgs = [np.full((10, 10, 3), 9, np.uint8)]
        b = DynamicBatcher(DynamicBatcherConfig(
            strategy=ShapeCompatibilityStrategy.MAX_DIMENSION,
            padding=PaddingStrategy.CENTER))
        [batch] = b.batch(imgs)
        oy, ox = batch.offsets[0]
        assert oy > 0 and ox > 0
        assert batch.images[0, oy, ox, 0] == 9

    def test_batch_edge_padding(self):
        img = np.zeros((4, 4, 3), np.uint8)
        img[-1, :] = 7
        b = DynamicBatcher(DynamicBatcherConfig(
            strategy=ShapeCompatibilityStrategy.EXACT,
            padding=PaddingStrategy.EDGE))
        b.cfg.side_buckets = b.cfg.side_buckets  # noqa
        [batch] = b.batch([img])
        assert batch.images[0, -1, 0, 0] == 7


class TestAspectBuckets:
    def test_defaults(self):
        assert [b.name for b in DEFAULT_ASPECT_BUCKETS][0] == "tall"
        assert DEFAULT_ASPECT_BUCKETS[-1].width == 320

    def test_bucket_for(self):
        ab = AspectRatioBucketing()
        assert ab.bucket_for(64, 32).name == "tall"
        assert ab.bucket_for(32, 320).name == "ultra_wide"

    def test_resize_and_pad(self, rng):
        ab = AspectRatioBucketing()
        img = rng.integers(0, 255, (50, 500, 3), dtype=np.uint8)
        out = ab.resize_and_pad(img)
        b = ab.bucket_for(50, 500)
        assert out.shape[:2] == (b.height, b.width)


class TestPredReverse:
    def test_pure_rtl(self):
        assert pred_reverse("abc") == "abc"  # single latin run unchanged

    def test_mixed(self):
        # arabic-like chars (here greek as stand-ins) reverse; latin keeps order
        assert pred_reverse("αβ12γ") == "γ12βα"

    def test_latin_runs_preserved(self):
        out = pred_reverse("αHello worldβ")
        assert out == "βHello worldα"

    def test_empty(self):
        assert pred_reverse("") == ""

import numpy as np
import pytest

from oar_ocr_tpu.core.types import LimitType
from oar_ocr_tpu.ops.resize import (DetResizeConfig, det_resize,
                                    det_target_size, pad_small_image,
                                    rec_batch_width, rec_crop_width)


pytestmark = pytest.mark.fast


class TestDetTargetSize:
    """Exact reference math (resize_detection.rs:243-305)."""

    def test_max_no_resize_needed(self):
        cfg = DetResizeConfig(960, LimitType.MAX)
        # 640x480 <= 960 → ratio 1, round to /32
        assert det_target_size(640, 480, cfg) == (640, 480)

    def test_max_shrinks_large(self):
        cfg = DetResizeConfig(960, LimitType.MAX)
        h, w = det_target_size(2000, 1000, cfg)
        # ratio = 960/2000 = 0.48 → (960, 480) both /32
        assert (h, w) == (960, 480)

    def test_rounding_to_32(self):
        cfg = DetResizeConfig(960, LimitType.MAX)
        # 1500x1000: ratio=0.64 → 960 x 640
        assert det_target_size(1500, 1000, cfg) == (960, 640)
        # 1000x700: ratio=0.96 → 960x672
        assert det_target_size(1000, 700, cfg) == (960, 672)
        # 900x700: no resize → round to /32: 896x704
        assert det_target_size(900, 700, cfg) == (896, 704)

    def test_min_grows_small(self):
        cfg = DetResizeConfig(736, LimitType.MIN)
        h, w = det_target_size(100, 400, cfg)
        # ratio = 736/100 = 7.36 → 736 x 2944
        assert (h, w) == (736, 2944)

    def test_resize_long(self):
        cfg = DetResizeConfig(960, LimitType.RESIZE_LONG)
        h, w = det_target_size(480, 240, cfg)
        # ratio = 2 → 960 x 480
        assert (h, w) == (960, 480)

    def test_max_side_limit(self):
        cfg = DetResizeConfig(960, LimitType.MIN, max_side_limit=4000)
        h, w = det_target_size(100, 1000, cfg)
        # ratio = 9.6 → 960 x 9600 → clamp by 4000/9600 → 400 x 4000
        assert h == 416 and w == 4000  # (400+16)//32*32=416, (4000+16)//32*32=4000

    def test_floor_of_32(self):
        cfg = DetResizeConfig(960, LimitType.MAX)
        assert det_target_size(40, 40, cfg) == (32, 32)


def test_pad_small_image():
    img = np.ones((10, 20, 3), np.uint8)
    out = pad_small_image(img)
    assert out.shape == (32, 32, 3)
    assert out[:10, :20].min() == 1
    assert out[10:].max() == 0
    big = np.ones((100, 100, 3), np.uint8)
    assert pad_small_image(big) is big


def test_det_resize_applies_cv2():
    img = np.random.default_rng(0).integers(0, 255, (2000, 1000, 3), np.uint8)
    resized, info = det_resize(img, DetResizeConfig())
    assert resized.shape[:2] == (960, 480)
    assert info.src_h == 2000 and info.dst_w == 480


class TestRecWidths:
    def test_canonical(self):
        # 4:1 crop at h=48 → w=192
        assert rec_crop_width(400, 100) == 192

    def test_cap(self):
        assert rec_crop_width(100000, 10) == 3200

    def test_batch_width(self):
        assert rec_batch_width([100, 250, 180]) == 250
        assert rec_batch_width([]) == 320

import jax.numpy as jnp
import numpy as np
import pytest

from oar_ocr_tpu.models.classification.pp_lcnet import (
    ClassifierPreprocess, DirectResizePreprocess,
    doc_orientation_classifier, textline_orientation_classifier)
from oar_ocr_tpu.ops.grid_sample import grid_sample, normalized_grid_to_pixels
from oar_ocr_tpu.pipelines.preprocess import (DocumentPreprocessor,
                                              rotate_image)


def test_classifier_preprocess_matrix():
    """resize_short 256 + center-crop 224: a 512×1024 image scales by 0.5,
    crop offset x = (512-224)/2 = 144."""
    pp = ClassifierPreprocess()
    m = pp.matrix(512, 1024)
    # output (0,0) → src ((0+144)+0.5)*2-0.5 = 288.5
    v = m @ np.array([0, 0, 1.0])
    assert v[0] == pytest.approx(288.5)
    assert v[1] == pytest.approx((0 + 16 + 0.5) * 2 - 0.5)


def test_direct_resize_matrix():
    pp = DirectResizePreprocess(80, 160)
    m = pp.matrix(40, 80)
    v = m @ np.array([159, 79, 1.0])
    assert v[0] == pytest.approx(79.25)  # (159.5)*0.5-0.5
    assert v[1] == pytest.approx(39.25)


def test_doc_orientation_runs(rng):
    cls = doc_orientation_classifier()
    pages = jnp.asarray(rng.integers(0, 255, (2, 256, 256, 3), dtype=np.uint8))
    out = cls.classify_pages(pages, [(256, 256), (200, 180)])
    assert len(out) == 2
    for c, s in out:
        assert 0 <= c <= 3 and 0.0 <= s <= 1.0


def test_textline_classify_quads(rng):
    cls = textline_orientation_classifier()
    pages = jnp.asarray(rng.integers(0, 255, (1, 128, 128, 3), dtype=np.uint8))
    quad = np.array([[10, 10], [100, 10], [100, 40], [10, 40]], np.float32)
    out = cls.classify_quads(pages, [(0, quad), (0, quad)])
    assert len(out) == 2 and out[0][0] in (0, 1)
    assert cls.classify_quads(pages, []) == []


def test_grid_sample_identity(rng):
    img = rng.integers(0, 255, (1, 16, 20, 3)).astype(np.float32)
    ys, xs = np.mgrid[0:16, 0:20].astype(np.float32)
    coords = np.stack([xs, ys], axis=-1)[None]
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_grid_sample_shift(rng):
    img = np.zeros((1, 8, 8, 1), np.float32)
    img[0, 2, 3, 0] = 100.0
    coords = np.stack(np.meshgrid(np.arange(8), np.arange(8))[0:2], -1)
    coords = np.stack([np.tile(np.arange(8, dtype=np.float32), (8, 1)) + 1,
                       np.tile(np.arange(8, dtype=np.float32)[:, None], (1, 8))],
                      axis=-1)[None]
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords)))
    assert out[0, 2, 2, 0] == pytest.approx(100.0)


def test_normalized_grid_to_pixels():
    g = jnp.asarray(np.array([[[[-1.0, -1.0], [1.0, 1.0]]]], np.float32))
    px = np.asarray(normalized_grid_to_pixels(g, 100, 50))
    np.testing.assert_allclose(px[0, 0, 0], [0, 0])
    np.testing.assert_allclose(px[0, 0, 1], [49, 99])


def test_rotate_image():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    r90 = rotate_image(img, 90)
    assert r90.shape == (4, 3, 1)
    assert rotate_image(img, 0).shape == (3, 4, 1)
    # 90 CCW: new(0,0) = old top-right
    assert r90[0, 0, 0] == img[0, 3, 0]


class _FixedOrientation:
    """Stub classifier returning one fixed class for every page."""

    def __init__(self, cls):
        self.cls = cls

    def classify_pages(self, dev, shapes):
        return [(self.cls, 0.99)] * len(shapes)


@pytest.mark.parametrize("cls,k", [(0, 0), (1, 1), (2, 2), (3, 3)])
def test_orientation_correction_direction(cls, k):
    """Label k·90 uprights with np.rot90(img, k) — +90k° CCW (PaddleX
    np.rot90(img, angle//90); preprocess.rs:111-149 class1→rotate270 =
    90° CCW in the image crate's CW naming, class3→rotate90 = 90° CW).
    A page that 'is rotated' by label k must come back pixel-identical
    to the upright original."""
    upright = np.arange(64 * 96 * 3, dtype=np.uint8).reshape(64, 96, 3)
    page = np.ascontiguousarray(np.rot90(upright, -k))  # un-upright it
    pre = DocumentPreprocessor(orientation=_FixedOrientation(cls),
                               use_orientation=True,
                               use_rectification=False)
    out = pre.preprocess([page])[0]
    assert out.orientation.angle == cls * 90
    assert np.array_equal(out.image, upright)
    assert (out.orientation.rotated_w, out.orientation.rotated_h) == (96, 64)


def test_rotate_points_back_inverts_correction():
    """geometry.rs:848 — a point in the corrected frame maps back to
    the original page frame by inverting the applied CCW rotation."""
    from oar_ocr_tpu.processors.geometry import rotate_points_back

    # corrected frame 64h×96w produced by a 90° CCW correction of a
    # 96h×64w page: corrected (x, y) ↔ page (W_p − y, x), W_p = 64
    pts = np.array([[10.0, 20.0]], np.float32)
    back = rotate_points_back(pts, 90, rotated_w=96, rotated_h=64)
    assert np.allclose(back, [[64 - 20, 10]])


def test_document_preprocessor_orientation_only(rng):
    pre = DocumentPreprocessor(use_orientation=True, use_rectification=False)
    imgs = [rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)]
    pages = pre.preprocess(imgs)
    assert len(pages) == 1
    assert pages[0].orientation is not None
    assert pages[0].can_map_back
    angle = pages[0].orientation.angle
    if angle in (90, 270):
        assert pages[0].image.shape[:2] == (96, 64)
    else:
        assert pages[0].image.shape[:2] == (64, 96)


def test_uvdoc_rectifier_shapes(rng):
    from oar_ocr_tpu.models.rectification.uvdoc import UVDocRectifier

    rect = UVDocRectifier()
    img = rng.integers(0, 255, (120, 100, 3), dtype=np.uint8)
    out = rect.rectify(img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_uvdoc_rectifier_identity_grid_reproduces_input(rng):
    """Regression for the round-3 coordinate collapse: with an IDENTITY
    sampling grid the rectifier must reproduce the source page (it used
    to emit a constant image because the [-1,1]->pixel conversion was
    scaled by (1-1)=0)."""
    import jax
    import jax.numpy as jnp

    from oar_ocr_tpu.models.rectification.uvdoc import UVDocRectifier

    rect = UVDocRectifier()

    class IdentityGridNet:
        def apply(self, params, x):
            gh, gw = 45, 31
            gy, gx = jnp.meshgrid(jnp.linspace(-1.0, 1.0, gh),
                                  jnp.linspace(-1.0, 1.0, gw),
                                  indexing="ij")
            grid = jnp.stack([gx, gy], -1)[None]
            return jnp.broadcast_to(grid, (x.shape[0], gh, gw, 2))

    rect.model = IdentityGridNet()
    rect._step = jax.jit(rect._step_impl, static_argnames=("out_h", "out_w"))
    img = rng.integers(0, 255, (96, 64, 3), dtype=np.uint8)
    out = rect.rectify(img)
    assert len(np.unique(out)) > 32          # definitely not constant
    # interior must match exactly up to bilinear-resize edge effects
    inner_out = out[8:-8, 8:-8].astype(np.int16)
    inner_in = img[8:-8, 8:-8].astype(np.int16)
    assert np.abs(inner_out - inner_in).mean() < 3.0

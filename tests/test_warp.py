import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from oar_ocr_tpu.ops.warp import (NormSpec, build_rec_crop_matrix,
                                  crop_geometry, resize_matrix,
                                  sample_transform, warp_crops)


def _page(rng, h=120, w=160):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


def test_resize_matrix_matches_cv2(rng):
    img = _page(rng)
    dst_h, dst_w = 60, 80
    ref = cv2.resize(img, (dst_w, dst_h), interpolation=cv2.INTER_LINEAR)

    pages = jnp.asarray(img[None])
    mats = jnp.asarray(resize_matrix(120, 160, dst_h, dst_w)[None])
    out = sample_transform(
        pages, mats, jnp.zeros(1, jnp.int32),
        jnp.array([dst_w], jnp.int32), jnp.array([dst_h], jnp.int32),
        out_h=dst_h, out_w=dst_w, norm=NormSpec.identity())
    out = np.asarray(out)[0]
    # interior must match cv2 bilinear closely (borders differ ≤1px clamp)
    # interior matches cv2 bilinear up to uint8 rounding of cv2's output
    diff = np.abs(np.round(out[1:-1, 1:-1]) - ref[1:-1, 1:-1].astype(np.float32))
    assert diff.mean() < 0.2
    assert np.median(diff) == 0.0


def test_upscale_matches_cv2_at_borders(rng):
    """Upscaling puts the first output row/col at a NEGATIVE source
    coordinate (cv2 half-pixel: 0.5·s − 0.5 < 0 for s < 1); the
    coordinate must border-clamp to pixel 0 like cv2, not blend pixels
    0 and 1 with inverted weights (the clamp-after-floor regression)."""
    img = _page(rng, h=8, w=10)
    dst_h, dst_w = 32, 40                             # 4x upscale
    ref = cv2.resize(img, (dst_w, dst_h), interpolation=cv2.INTER_LINEAR)
    pages = jnp.asarray(img[None])
    mats = jnp.asarray(resize_matrix(8, 10, dst_h, dst_w)[None])
    out = np.asarray(sample_transform(
        pages, mats, jnp.zeros(1, jnp.int32),
        jnp.array([dst_w], jnp.int32), jnp.array([dst_h], jnp.int32),
        out_h=dst_h, out_w=dst_w, norm=NormSpec.identity()))[0]
    # the FIRST row/col are exactly the border-clamped samples cv2 makes
    diff = np.abs(np.round(out) - ref.astype(np.float32))
    assert diff[0].max() <= 1.0 and diff[:, 0].max() <= 1.0
    assert diff.mean() < 0.2


def test_warp_crops_pads_post_normalize_black(rng):
    """Bucket padding beyond valid_w must be the post-normalize black
    (−1 through x·2/255−1), matching separable_resize_normalize and the
    reference's PaddingStrategy::Black — NOT 0.0 (mid-gray)."""
    img = _page(rng)
    mats = jnp.asarray(resize_matrix(48, 64, 48, 64)[None])
    tiles = np.asarray(warp_crops(
        jnp.asarray(img[None, :48, :64]), mats, jnp.zeros(1, jnp.int32),
        jnp.array([40], jnp.int32), out_h=48, out_w=64))
    assert np.all(tiles[0, :, 40:] == -1.0)
    assert tiles[0, :, :40].std() > 0


def test_grid_sample_border_clamps_negative_coords(rng):
    """Coords in (−1, 0) must yield the border pixel (remap clamp), not
    a 0/1 blend with inverted weights."""
    from oar_ocr_tpu.ops.grid_sample import grid_sample

    img = np.zeros((1, 4, 4, 1), np.float32)
    img[0, :, 0, 0] = 100.0                      # col 0 bright
    img[0, :, 1, 0] = 200.0
    coords = np.zeros((1, 1, 1, 2), np.float32)
    coords[0, 0, 0] = (-0.9, 1.0)                # x in (−1, 0)
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords)))
    assert out[0, 0, 0, 0] == pytest.approx(100.0)   # border, not 190


def test_axis_aligned_crop(rng):
    img = _page(rng)
    quad = np.array([[20, 30], [116, 30], [116, 62], [20, 62]], np.float32)
    cw, ch, rot = crop_geometry(quad)
    assert (cw, ch, rot) == (96, 32, False)
    w = int(np.ceil(48 * cw / ch))  # 144
    mat, rotated = build_rec_crop_matrix(quad, w, 48)
    assert not rotated

    pages = jnp.asarray(img[None])
    out = warp_crops(pages, jnp.asarray(mat[None]), jnp.zeros(1, jnp.int32),
                     jnp.array([w], jnp.int32), out_h=48, out_w=160,
                     normalize=False)
    out = np.asarray(out)[0]
    # padding beyond valid_w is zero
    assert np.abs(out[:, w:]).max() == 0.0
    # reference: crop then resize with cv2
    crop = cv2.warpPerspective(
        img, cv2.getPerspectiveTransform(
            quad, np.array([[0, 0], [cw, 0], [cw, ch], [0, ch]], np.float32)),
        (cw, ch))
    ref = cv2.resize(crop, (w, 48), interpolation=cv2.INTER_LINEAR)
    # BGR swap in warp_crops is off only when normalize=False? No: swap is
    # part of NormSpec.rec_bgr; identity keeps RGB. Compare directly.
    diff = np.abs(out[2:-2, 2 : w - 2] - ref[2:-2, 2 : w - 2].astype(np.float32))
    assert diff.mean() < 2.0


def test_tall_crop_rotates():
    quad = np.array([[10, 10], [30, 10], [30, 100], [10, 100]], np.float32)
    cw, ch, rot = crop_geometry(quad)
    assert rot  # 90 >= 20*1.5
    # effective ratio after rotation: w=ch, h=cw
    assert ch > cw


def test_rotated_crop_content(rng):
    """A tall crop is rotated 90° CCW: the quad's TR corner region appears
    at the tile's top-left."""
    img = np.zeros((120, 160, 3), np.uint8)
    # paint the quad region with a horizontal gradient
    img[10:100, 10:30] = np.linspace(10, 250, 20)[None, :, None].astype(np.uint8)
    quad = np.array([[10, 10], [29, 10], [29, 99], [10, 99]], np.float32)
    w = 100
    mat, rotated = build_rec_crop_matrix(quad, w, 48)
    assert rotated
    out = np.asarray(warp_crops(
        jnp.asarray(img[None]), jnp.asarray(mat[None]),
        jnp.zeros(1, jnp.int32), jnp.array([w], jnp.int32),
        out_h=48, out_w=128, normalize=False))[0]
    # After 90° CCW rotation the gradient (which ran along source x) runs
    # along the tile's -y axis: columns are constant, rows vary.
    col_var = out[:, 5:90, 0].std(axis=0).mean()
    row_var = out[:, 5:90, 0].std(axis=1).mean()
    assert col_var > row_var * 3


def test_normalization_fused(rng):
    img = np.full((64, 64, 3), 255, np.uint8)
    img[:, :, 0] = 0  # R=0, G=B=255
    quad = np.array([[0, 0], [63, 0], [63, 31], [0, 31]], np.float32)
    mat, _ = build_rec_crop_matrix(quad, 96, 48)
    out = np.asarray(warp_crops(
        jnp.asarray(img[None]), jnp.asarray(mat[None]),
        jnp.zeros(1, jnp.int32), jnp.array([96], jnp.int32),
        out_h=48, out_w=96, normalize=True))[0]
    # BGR order: channel 0 = B = 255 → 1.0; channel 2 = R = 0 → -1.0
    assert out[10, 10, 0] == pytest.approx(1.0, abs=0.02)
    assert out[10, 10, 2] == pytest.approx(-1.0, abs=0.02)


def test_multi_image_indexing(rng):
    imgs = np.stack([np.full((32, 32, 3), 50, np.uint8),
                     np.full((32, 32, 3), 200, np.uint8)])
    quad = np.array([[0, 0], [31, 0], [31, 15], [0, 15]], np.float32)
    mat, _ = build_rec_crop_matrix(quad, 64, 48)
    mats = jnp.asarray(np.stack([mat, mat]))
    out = np.asarray(warp_crops(
        jnp.asarray(imgs), mats, jnp.array([0, 1], jnp.int32),
        jnp.array([64, 64], jnp.int32), out_h=48, out_w=64, normalize=False))
    assert abs(out[0, 5, 5, 0] - 50) < 1
    assert abs(out[1, 5, 5, 0] - 200) < 1


def test_host_warp_matches_device_warp(rng):
    """cv2 WARP_INVERSE_MAP with a plan matrix must produce the same
    native tile as the device sampler (same matrix, same convention)."""
    import cv2

    from oar_ocr_tpu.models.recognition.recognizer import CropPlan
    from oar_ocr_tpu.ops.warp import NormSpec, sample_transform

    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    quad = np.array([[20, 30], [116, 34], [114, 62], [18, 58]], np.float32)
    plan = CropPlan.from_quad(0, quad)
    nat_h, nat_w = 64, 160

    dev = np.asarray(sample_transform(
        jnp.asarray(img[None]), jnp.asarray(plan.matrix[None]),
        jnp.zeros(1, jnp.int32),
        jnp.asarray([min(plan.native_w, nat_w)], jnp.int32),
        jnp.asarray([min(plan.native_h, nat_h)], jnp.int32),
        out_h=nat_h, out_w=nat_w, norm=NormSpec.identity()))[0]

    host = cv2.warpPerspective(
        img, plan.matrix, (nat_w, nat_h),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT).astype(np.float32)
    host[min(plan.native_h, nat_h):] = 0
    host[:, min(plan.native_w, nat_w):] = 0

    valid = host[: plan.native_h - 1, : plan.native_w - 1]
    devv = dev[: plan.native_h - 1, : plan.native_w - 1]
    # cv2 rounds to uint8 and uses fixed-point coeffs; border clamp differs
    # on the 1px rim — interior must agree within ~2 intensity levels
    diff = np.abs(np.round(devv) - valid)
    assert np.median(diff) <= 1.0
    assert diff.mean() < 2.5


class TestSeparableWarp:
    """The matmul-only rec preprocess (warp_rec_tiles_separable) must match
    the two-stage gather chain (stage-1 sample_transform at native res +
    stage-2 separable_resize_normalize) to float tolerance."""

    def _two_stage(self, pages, mats, img_idx, nat_h, nat_w, widths,
                   nat_hb, nat_wb, out_w, out_h=48):
        from oar_ocr_tpu.ops.det_device import separable_resize_normalize

        native = sample_transform(
            jnp.asarray(pages), jnp.asarray(mats),
            jnp.asarray(img_idx, jnp.int32),
            jnp.asarray(nat_w, jnp.int32), jnp.asarray(nat_h, jnp.int32),
            out_h=nat_hb, out_w=nat_wb, norm=NormSpec.identity())
        native = native[..., ::-1]
        b = len(mats)
        return np.asarray(separable_resize_normalize(
            native, jnp.asarray(nat_h, jnp.int32),
            jnp.asarray(nat_w, jnp.int32),
            jnp.full((b,), out_h, jnp.int32),
            jnp.asarray(widths, jnp.int32),
            jnp.full((3,), 2.0 / 255.0, jnp.float32),
            jnp.full((3,), -1.0, jnp.float32),
            out_h=out_h, out_w=out_w, out_dtype=jnp.float32,
            pad_value=-1.0))    # black-pixel pad through x·2/255−1

    def _separable(self, pages, mats, img_idx, nat_h, nat_w, widths,
                   nat_hb, nat_wb, out_w, out_h=48):
        from oar_ocr_tpu.ops.warp import (band_origin, separable_coefs,
                                          warp_rec_tiles_separable)

        pages = jnp.asarray(pages)
        pages_t = jnp.transpose(pages, (0, 2, 1, 3))
        band_h = nat_hb + 8
        out = np.zeros((len(mats), out_h, out_w, 3), np.float32)
        # run the direct and swapped groups separately, like dispatch does
        for want_swap, src in ((False, pages), (True, pages_t)):
            rows, cols, y0s, sel = [], [], [], []
            for k, m in enumerate(mats):
                got = separable_coefs(m)
                assert got is not None
                s, rc, cc = got
                if s != want_swap:
                    continue
                sel.append(k)
                rows.append(rc)
                cols.append(cc)
                y0s.append(band_origin(rc, nat_h[k], src.shape[1], band_h))
            if not sel:
                continue
            got_tiles = np.asarray(warp_rec_tiles_separable(
                src, jnp.asarray(rows, jnp.float32),
                jnp.asarray(cols, jnp.float32),
                jnp.asarray([img_idx[k] for k in sel], jnp.int32),
                jnp.asarray(y0s, jnp.int32),
                jnp.asarray([nat_h[k] for k in sel], jnp.int32),
                jnp.asarray([nat_w[k] for k in sel], jnp.int32),
                jnp.asarray([widths[k] for k in sel], jnp.int32),
                out_h=out_h, out_w=out_w, nat_h_bucket=nat_hb,
                nat_w_bucket=nat_wb, band_h=band_h,
                norm=NormSpec.rec_bgr(), out_dtype=jnp.float32))
            for local, k in enumerate(sel):
                out[k] = got_tiles[local]
        return out

    def test_matches_two_stage_mixed(self, rng):
        from oar_ocr_tpu.ops.warp import build_native_crop_matrix

        pages = np.stack([_page(rng, 160, 200), _page(rng, 160, 200)])
        quads = [
            np.array([[20, 30], [140, 30], [140, 60], [20, 60]], np.float32),
            np.array([[50, 20], [80, 20], [80, 120], [50, 120]], np.float32),
            np.array([[10, 90], [180, 90], [180, 118], [10, 118]],
                     np.float32),
        ]
        mats, nat_w, nat_h, widths, img_idx = [], [], [], [], []
        for i, q in enumerate(quads):
            m, rw, rh = build_native_crop_matrix(q)
            mats.append(m)
            nat_w.append(rw)
            nat_h.append(rh)
            widths.append(min(int(np.ceil(48 * rw / rh)), 320))
            img_idx.append(i % 2)
        nat_hb, nat_wb, out_w = 64, 256, 320
        ref = self._two_stage(pages, mats, img_idx, nat_h, nat_w, widths,
                              nat_hb, nat_wb, out_w)
        got = self._separable(pages, mats, img_idx, nat_h, nat_w, widths,
                              nat_hb, nat_wb, out_w)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_flip180_stays_separable(self, rng):
        from oar_ocr_tpu.ops.warp import (build_native_crop_matrix,
                                          separable_coefs)
        from oar_ocr_tpu.pipelines.ocr import _compose_rot180

        q = np.array([[20, 30], [140, 30], [140, 60], [20, 60]], np.float32)
        m, rw, rh = build_native_crop_matrix(q)
        m2 = _compose_rot180(m, rw, rh)
        assert separable_coefs(m2) is not None
        pages = np.stack([_page(rng, 160, 200)])
        ref = self._two_stage(pages, [m2], [0], [rh], [rw], [120],
                              64, 256, 320)
        got = self._separable(pages, [m2], [0], [rh], [rw], [120],
                              64, 256, 320)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_slanted_is_rejected(self):
        from oar_ocr_tpu.ops.warp import (build_native_crop_matrix,
                                          separable_coefs)

        q = np.array([[30, 30], [120, 50], [110, 80], [20, 60]], np.float32)
        m, _, _ = build_native_crop_matrix(q)
        assert separable_coefs(m) is None

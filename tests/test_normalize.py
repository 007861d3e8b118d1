"""Fused normalize op (ops/normalize.py): XLA fallback numerics on CPU;
the Pallas path runs on TPU (platform-gated) with identical coefficients."""

import jax.numpy as jnp
import numpy as np
import pytest

from oar_ocr_tpu.ops.normalize import _tiled_coeffs, normalize_images


def test_fallback_matches_formula(rng):
    imgs = rng.integers(0, 255, (2, 8, 10, 3), dtype=np.uint8)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    out = np.asarray(normalize_images(
        jnp.asarray(imgs), mean=mean, std=std, use_pallas=False))
    ref = (imgs.astype(np.float32) / 255.0 - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fallback_swap_rb(rng):
    imgs = rng.integers(0, 255, (1, 4, 4, 3), dtype=np.uint8)
    out = np.asarray(normalize_images(
        jnp.asarray(imgs), mean=(0, 0, 0), std=(1, 1, 1), scale=1.0,
        swap_rb=True, use_pallas=False))
    np.testing.assert_allclose(out[..., 0], imgs[..., 2].astype(np.float32))


def test_tiled_coeffs_layout():
    a, b = _tiled_coeffs(4, 3, (1.0, 2.0, 3.0), (0.1, 0.2, 0.3), False)
    assert a.shape[0] % 128 == 0
    np.testing.assert_allclose(a[:6], [1, 2, 3, 1, 2, 3])
    a2, _ = _tiled_coeffs(4, 3, (1.0, 2.0, 3.0), (0.1, 0.2, 0.3), True)
    np.testing.assert_allclose(a2[:3], [3, 2, 1])

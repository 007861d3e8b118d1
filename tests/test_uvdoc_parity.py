"""Golden structural parity for the UVDoc rectification net
(VERDICT r2 item 4): flax vs the torch mirror of the public UVDoc/DDCP
architecture, strict two-way conversion + numeric parity, and grid
geometry (712×488 → exactly the 45×31 GRID_SIZE)."""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.models.rectification.uvdoc_exact import UVDocNetExact
from oar_ocr_tpu.runtime.ppocr_maps import build_ppocr_map
from oar_ocr_tpu.runtime.runtime import init_params
from tools import torch_ref_uvdoc as tu
from tools.torch_ref import seed_all


@pytest.fixture(scope="module")
def models():
    t = tu.UVDocTorch(num_filter=8, block_nums=(2, 2))
    seed_all(t, seed=9)
    f = UVDocNetExact(num_filter=8, block_nums=(2, 2))
    params = init_params(f, (1, 96, 64, 3))
    cm = build_ppocr_map(params, name="uvdoc")
    fixture = tu.export(t)
    tree = cm.convert(fixture, strict=True)
    assert cm.unused_sources(fixture) == []
    return t, f, tree


def test_end_to_end_parity(models):
    t, f, tree = models
    x = np.random.default_rng(0).normal(size=(1, 96, 64, 3)).astype(
        np.float32) * 0.3
    with torch.no_grad():
        ref2d, ref3d = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    g2d, g3d = f.apply(tree, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(g2d), ref2d.numpy().transpose(0, 2, 3, 1),
        atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(g3d), ref3d.numpy().transpose(0, 2, 3, 1),
        atol=5e-4, rtol=1e-3)


def test_grid_geometry():
    """712×488 input → the UVDoc GRID_SIZE 45×31 at stride 16 (conv
    arithmetic with 5×5 pad-2 heads)."""
    import jax

    from oar_ocr_tpu.models.rectification.uvdoc_exact import (
        UVDOC_GRID_HW, UVDOC_INPUT_HW)

    f = UVDocNetExact(num_filter=4, block_nums=(1, 1))
    shapes = jax.eval_shape(
        lambda: f.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, *UVDOC_INPUT_HW, 3), jnp.float32)))
    g2d, _ = jax.eval_shape(
        f.apply,
        jax.eval_shape(lambda: f.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, *UVDOC_INPUT_HW, 3), jnp.float32))),
        jnp.zeros((1, *UVDOC_INPUT_HW, 3), jnp.float32))
    assert g2d.shape == (1, *UVDOC_GRID_HW, 2)

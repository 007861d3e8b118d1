"""Golden conversion parity: exact PicoDet layout detector.

Same pattern as RT-DETR (test_rtdetr_parity.py): a torch oracle mirrors
the PaddleDetection deploy architecture (tools/torch_ref_picodet.py),
its state dict with official attribute paths IS the fixture; strict
conversion both ways + end-to-end numeric parity.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.models.detection.picodet_exact import PicoDetExact
from oar_ocr_tpu.runtime.ppocr_maps import build_ppocr_map
from oar_ocr_tpu.runtime.runtime import init_params
from tools import torch_ref_picodet as tp
from tools.torch_ref import seed_all


@pytest.fixture(scope="module")
def models():
    t = tp.PicoDetTorch(num_classes=5, scale=0.5, neck_feat=64,
                        head_convs=2)
    seed_all(t, seed=7)
    f = PicoDetExact(num_classes=5, scale=0.5, neck_feat=64, head_convs=2)
    params = init_params(f, (1, 128, 96, 3))
    cm = build_ppocr_map(params, name="picodet")
    fixture = tp.export(t)
    tree = cm.convert(fixture, strict=True)     # no missing names
    assert cm.unused_sources(fixture) == []     # every tensor maps
    return t, f, tree


def test_end_to_end_parity(models):
    t, f, tree = models
    x = np.random.default_rng(0).normal(size=(1, 128, 96, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref_scores, ref_boxes = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    scores, boxes = f.apply(tree, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(scores), ref_scores.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(boxes), ref_boxes.numpy(),
                               atol=2e-3, rtol=1e-3)


def test_anchor_layout(models):
    _, f, tree = models
    x = np.zeros((1, 128, 96, 3), np.float32)
    scores, boxes = f.apply(tree, jnp.asarray(x))
    # anchors: conv arithmetic — each stride-2 stage is ceil(n/2)
    expect = sum(-(-128 // s) * (-(-96 // s)) for s in (8, 16, 32, 64))
    assert scores.shape == (1, expect, 5)
    assert boxes.shape == (1, expect, 4)

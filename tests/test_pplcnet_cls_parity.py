"""Golden parity for the exact PP-LCNet v1 PULC classifier topology
(pp_lcnet.rs:89-253's checkpoints) — strict conversion closure + logits
agreement vs the torch oracle, at both PULC scales (x1_0 and x0_25)."""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.models.classification.pp_lcnet_exact import (
    PPLCNetV1Cls, build_pplcnet_cls_map)
from oar_ocr_tpu.runtime.runtime import init_params
from tools import torch_ref_slanet as tr


@pytest.mark.parametrize("scale,classes,hw", [(1.0, 4, 224), (0.25, 2, 80)])
def test_cls_parity(scale, classes, hw):
    t = tr.PPLCNetCls(class_num=classes, scale=scale)
    tr.seed_all(t, seed=9)
    f = PPLCNetV1Cls(class_num=classes, scale=scale)
    params = init_params(f, (1, hw, hw, 3))
    cm = build_pplcnet_cls_map(params)
    fixture = tr.export(t)
    tree = cm.convert(fixture, strict=True)
    assert cm.unused_sources(fixture) == []

    x = np.random.default_rng(0).normal(
        size=(2, hw, hw, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(f.apply(tree, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))


def test_official_names():
    f = PPLCNetV1Cls(class_num=4)
    params = init_params(f, (1, 64, 64, 3))
    cm = build_pplcnet_cls_map(params)
    names = {s for _, s, _ in cm.rules}
    for expected in [
        "conv1.conv.weight",
        "blocks6.1.se.conv2.weight",
        "blocks5.5.pw_conv.bn._mean",
        "last_conv.weight",
        "fc.weight",
        "fc.bias",
    ]:
        assert expected in names, expected

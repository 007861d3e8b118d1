"""Golden conversion parity for PaddleOCR-VL (VERDICT r1 #3).

Oracle: an independent torch implementation with HF checkpoint tensor
names (tools/torch_ref_vl.py) operating on whole images in raster order;
the flax side operates on host-flattened patches in 2×2-block order with
host-interpolated position embeddings. Agreement proves the conversion
map, the patch/packing layout, the 2-D vision rope, the gelu-erf
projector merge, and the Ernie MRoPE decoder numerics together.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.runtime.ppocr_maps import (build_vl_map, export_vl_format,
                                            hf_vl_name)
from oar_ocr_tpu.vl.model import PaddleOCRVL
from oar_ocr_tpu.vl.paddleocr_vl import PaddleOCRVLConfig, PaddleOCRVLModule
from tools import torch_ref_vl as trv


@pytest.fixture(scope="module")
def pair():
    cfg = PaddleOCRVLConfig().tiny()
    t = trv.PaddleOCRVLTorch(
        vocab=cfg.vocab_size, hidden=cfg.hidden, layers=cfg.layers,
        heads=cfg.heads, kv=cfg.kv_heads, head_dim=cfg.head_dim,
        ffn=cfg.ffn, use_bias=cfg.use_bias, rms_eps=cfg.rms_eps,
        theta=cfg.rope_theta, mrope=cfg.mrope_sections, v_dim=cfg.v_dim,
        v_ffn=cfg.v_ffn, v_layers=cfg.v_layers, v_heads=cfg.v_heads,
        v_patch=cfg.v_patch, v_merge=cfg.v_merge, v_grid=cfg.v_grid)
    trv.seed_all(t, 7)
    vlm = PaddleOCRVL(cfg=cfg)
    cm = build_vl_map(vlm.params)
    fixture = trv.hf_state_dict(t)
    tree = cm.convert(fixture, strict=True)
    assert cm.unused_sources(fixture) == []
    return cfg, t, tree


def test_names(pair):
    assert hf_vl_name("params/model/layers.0/self_attn.q_proj/kernel") == \
        "model.layers.0.self_attn.q_proj.weight"
    assert hf_vl_name(
        "params/visual.vision_model/encoder.layers.1/mlp/fc1/bias") == \
        "visual.vision_model.encoder.layers.1.mlp.fc1.bias"


def test_vision_projector_parity(pair):
    cfg, t, tree = pair
    vlm = PaddleOCRVL(cfg=cfg, params=tree)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2 * cfg.v_patch * 2, 2 * cfg.v_patch * 2, 3),
                       np.uint8)  # 4×4 patch grid
    patches, (gh, gw), h_ids, w_ids = vlm._prepare_image(img)
    pos = vlm._interp_pos_embed(gh, gw)
    ours = np.asarray(vlm._encode_vision(
        vlm.params, jnp.asarray(patches[None], jnp.float32),
        jnp.ones((1, patches.shape[0]), bool),
        jnp.asarray(h_ids[None]), jnp.asarray(w_ids[None]),
        jnp.asarray(pos[None], jnp.float32)))[0]

    # torch side consumes the same normalized pixel grid, NCHW
    import cv2

    from oar_ocr_tpu.vl.processing import smart_resize
    th, tw = smart_resize(*img.shape[:2], vlm.vcfg)
    resized = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
    x = (resized.astype(np.float32) / 255.0 - 0.5) / 0.5
    with torch.no_grad():
        ref, (tgh, tgw) = t.encode_image(
            torch.from_numpy(x.transpose(2, 0, 1))[None])
    assert (gh, gw) == (tgh, tgw)
    # torch projector outputs merged tokens in (hb, wb) raster order;
    # the flax block ordering yields the same merged-token order
    np.testing.assert_allclose(ours, ref.numpy(), atol=3e-4, rtol=1e-3)


def test_text_prefill_parity(pair):
    cfg, t, tree = pair
    mod = PaddleOCRVLModule(cfg)
    rng = np.random.default_rng(1)
    n = 7
    ids = rng.integers(3, cfg.vocab_size - 1, (1, n))
    pos = np.broadcast_to(np.arange(n)[None, None], (3, 1, n)).copy()
    with torch.no_grad():
        ref = t.forward_text(torch.from_numpy(ids),
                             torch.from_numpy(pos)).numpy()

    from oar_ocr_tpu.vl.kv_cache import KVCache

    emb = mod.apply(tree, jnp.asarray(ids),
                    method=PaddleOCRVLModule.embed_tokens)
    cache = KVCache.create(cfg.layers, 1, cfg.kv_heads, n, cfg.head_dim,
                           dtype=jnp.float32)
    mask = np.tril(np.ones((n, n), bool))[None, None]
    logits, _ = mod.apply(tree, emb, jnp.asarray(pos), cache,
                          jnp.asarray(mask),
                          method=PaddleOCRVLModule.prefill)
    # prefill returns last-position logits only
    np.testing.assert_allclose(np.asarray(logits)[0], ref[0, -1],
                               atol=3e-4, rtol=1e-3)


def test_roundtrip(pair):
    cfg, _, tree = pair
    from oar_ocr_tpu.runtime.weights import flatten_params

    deploy = export_vl_format(tree)
    cm = build_vl_map(tree)
    back = cm.convert(deploy, strict=True)
    a, b = flatten_params(tree), flatten_params(back)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

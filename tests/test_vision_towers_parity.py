"""Golden parity: MinerU (Qwen2-VL) + HPD (InternViT) vision towers and
the InternVL dynamic tiling (VERDICT r1 #3 remainder).

Tiling assertions reuse the reference's OWN fixture values
(hpd_parsing/processing.rs tests: (514,64)→(8,1), (760,865)→(2,2),
(248,193)→(5,4), (720,1150)→(2,3))."""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
import jax  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.vl.vision_towers import (HpdVisionConfig, HpdVisionModel,
                                          MinerUVisionConfig,
                                          MinerUVisionModel,
                                          intern_closest_ratio,
                                          intern_target_ratios,
                                          intern_tile_image,
                                          mineru_vision_positions,
                                          _qwen_vision_rope)
from oar_ocr_tpu.runtime.ppocr_maps import build_hunyuan_map
from tools import torch_ref_towers as tr
from tools.torch_ref_vl import hf_state_dict, seed_all


class TestMinerUVision:
    @pytest.fixture(scope="class")
    def models(self):
        cfg = MinerUVisionConfig().tiny()
        t = tr.MinerUVisionTorch(embed_dim=cfg.embed_dim, heads=cfg.heads,
                                 layers=cfg.layers, patch=cfg.patch,
                                 temporal_patch=cfg.temporal_patch,
                                 merge=cfg.merge, out_hidden=cfg.out_hidden)
        seed_all(t, seed=9)
        f = MinerUVisionModel(cfg)
        h = w = 4
        hp, wp = mineru_vision_positions(h, w, cfg.merge)
        cos, sin = _qwen_vision_rope(hp, wp, cfg.head_dim, cfg.rope_theta)
        pd = 3 * cfg.temporal_patch * cfg.patch ** 2
        params = f.init(jax.random.PRNGKey(0),
                        jnp.zeros((h * w, pd), jnp.float32),
                        jnp.asarray(cos), jnp.asarray(sin))
        cm = build_hunyuan_map(params, name="mineru-vision")
        fixture = hf_state_dict(t)
        tree = cm.convert(fixture, strict=True)
        assert cm.unused_sources(fixture) == []
        return cfg, t, f, tree

    def test_forward_parity(self, models):
        cfg, t, f, tree = models
        h = w = 4
        pd = 3 * cfg.temporal_patch * cfg.patch ** 2
        patches = np.random.default_rng(1).normal(
            size=(h * w, pd)).astype(np.float32)
        hp, wp = mineru_vision_positions(h, w, cfg.merge)
        cos, sin = _qwen_vision_rope(hp, wp, cfg.head_dim, cfg.rope_theta)
        with torch.no_grad():
            ref = t(torch.from_numpy(patches), torch.from_numpy(hp),
                    torch.from_numpy(wp)).numpy()
        ours = f.apply(tree, jnp.asarray(patches), jnp.asarray(cos),
                       jnp.asarray(sin))
        assert ours.shape == ref.shape       # (hw/merge², out_hidden)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4,
                                   rtol=1e-3)

    def test_positions_merge_block_order(self, models):
        hp, wp = mineru_vision_positions(4, 4, 2)
        # first block: (0,0),(0,1),(1,0),(1,1)
        np.testing.assert_array_equal(hp[:4], [0, 0, 1, 1])
        np.testing.assert_array_equal(wp[:4], [0, 1, 0, 1])
        # second block shifts w by merge
        np.testing.assert_array_equal(wp[4:8], [2, 3, 2, 3])


class TestHpdVision:
    @pytest.fixture(scope="class")
    def models(self):
        cfg = HpdVisionConfig().tiny()
        t = tr.HpdVisionTorch(hidden=cfg.hidden, ffn=cfg.ffn,
                              layers=cfg.layers, heads=cfg.heads,
                              image_size=cfg.image_size, patch=cfg.patch,
                              llm_hidden=cfg.llm_hidden,
                              downsample=cfg.downsample)
        seed_all(t, seed=13)
        f = HpdVisionModel(cfg)
        pd = 3 * cfg.patch ** 2
        params = f.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, cfg.grid ** 2, pd), jnp.float32))
        cm = build_hunyuan_map(params, name="hpd-vision")
        fixture = hf_state_dict(t)
        tree = cm.convert(fixture, strict=True)
        assert cm.unused_sources(fixture) == []
        return cfg, t, f, tree

    def test_forward_parity(self, models):
        cfg, t, f, tree = models
        pd = 3 * cfg.patch ** 2
        patches = np.random.default_rng(2).normal(
            size=(2, cfg.grid ** 2, pd)).astype(np.float32)
        with torch.no_grad():
            ref = t(torch.from_numpy(patches)).numpy()
        ours = f.apply(tree, jnp.asarray(patches))
        # (tiles · (grid/ds)², llm_hidden)
        r = cfg.grid // cfg.downsample
        assert ours.shape == (2 * r * r, cfg.llm_hidden) == ref.shape
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4,
                                   rtol=1e-3)


class TestInternTiling:
    def test_ratios_unique_area_sorted(self):
        ratios = intern_target_ratios(1, 4)
        assert len(ratios) == 8
        areas = [c * r for c, r in ratios]
        assert areas == sorted(areas)

    def test_official_fixture_choices(self):
        ratios = intern_target_ratios(1, 25)
        assert intern_closest_ratio(514, 64, 448, ratios) == (8, 1)
        assert intern_closest_ratio(760, 865, 448, ratios) == (2, 2)
        assert intern_closest_ratio(248, 193, 448, ratios) == (5, 4)
        assert intern_closest_ratio(720, 1150, 448, ratios) == (2, 3)

    def test_tile_image_counts(self):
        img = np.zeros((865, 760, 3), np.uint8)
        tiles = intern_tile_image(img, image_size=448, max_blocks=12)
        # (2, 2) grid + thumbnail
        assert len(tiles) == 5
        assert all(t.shape == (448, 448, 3) for t in tiles)
        # single tile → no thumbnail
        sq = np.zeros((448, 448, 3), np.uint8)
        assert len(intern_tile_image(sq, image_size=448, max_blocks=1)) == 1


class TestGlmVision:
    def test_forward_parity(self):
        from oar_ocr_tpu.vl.vision_towers import (GlmVisionConfig,
                                                  GlmVisionModel)

        cfg = GlmVisionConfig().tiny()
        t = tr.GlmVisionTorch(hidden=cfg.hidden, heads=cfg.heads,
                              ffn=cfg.ffn, depth=cfg.depth,
                              patch=cfg.patch, merge=cfg.merge,
                              out_hidden=cfg.out_hidden, eps=cfg.rms_eps)
        seed_all(t, seed=17)
        f = GlmVisionModel(cfg)
        h = w = 4
        hp, wp = mineru_vision_positions(h, w, cfg.merge)
        cos, sin = _qwen_vision_rope(hp, wp, cfg.head_dim, cfg.rope_theta)
        pd = 3 * cfg.patch ** 2
        patches = np.random.default_rng(3).normal(
            size=(h * w, pd)).astype(np.float32)
        params = f.init(jax.random.PRNGKey(0), jnp.asarray(patches),
                        jnp.asarray(cos), jnp.asarray(sin))
        cm = build_hunyuan_map(params, name="glm-vision")
        fixture = hf_state_dict(t)
        tree = cm.convert(fixture, strict=True)
        assert cm.unused_sources(fixture) == []
        with torch.no_grad():
            ref = t(torch.from_numpy(patches),
                    torch.from_numpy(cos), torch.from_numpy(sin)).numpy()
        ours = f.apply(tree, jnp.asarray(patches), jnp.asarray(cos),
                       jnp.asarray(sin))
        assert ours.shape == ref.shape    # (hw/merge², out_hidden)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4,
                                   rtol=1e-3)


class TestOvisVision:
    def test_forward_parity(self):
        from oar_ocr_tpu.vl.vision_towers import (OvisVisionConfig,
                                                  OvisVisionModel)

        cfg = OvisVisionConfig().tiny()
        t = tr.OvisVisionTorch(hidden=cfg.hidden, heads=cfg.heads,
                               ffn=cfg.ffn, depth=cfg.depth,
                               patch=cfg.patch, merge=cfg.merge,
                               out_hidden=cfg.out_hidden,
                               num_positions=cfg.num_positions,
                               eps=cfg.ln_eps)
        seed_all(t, seed=19)
        f = OvisVisionModel(cfg)
        h = w = 4
        hp, wp = mineru_vision_positions(h, w, cfg.merge)
        cos, sin = _qwen_vision_rope(hp, wp, cfg.head_dim, cfg.rope_theta)
        pd = 3 * cfg.patch ** 2
        rng = np.random.default_rng(4)
        patches = rng.normal(size=(h * w, pd)).astype(np.float32)
        pos_rows = rng.normal(size=(h * w, cfg.hidden)).astype(np.float32)
        params = f.init(jax.random.PRNGKey(0), jnp.asarray(patches),
                        jnp.asarray(pos_rows), jnp.asarray(cos),
                        jnp.asarray(sin))
        cm = build_hunyuan_map(params, name="ovis-vision")
        fixture = hf_state_dict(t)
        tree = cm.convert(fixture, strict=True)
        assert cm.unused_sources(fixture) == []
        with torch.no_grad():
            ref = t(torch.from_numpy(patches), torch.from_numpy(pos_rows),
                    torch.from_numpy(cos), torch.from_numpy(sin)).numpy()
        ours = f.apply(tree, jnp.asarray(patches), jnp.asarray(pos_rows),
                       jnp.asarray(cos), jnp.asarray(sin))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4,
                                   rtol=1e-3)


class TestMonkeyVision:
    def test_forward_parity(self):
        from oar_ocr_tpu.vl.vision_towers import (MonkeyVisionConfig,
                                                  MonkeyVisionModel)

        cfg = MonkeyVisionConfig().tiny()
        t = tr.MonkeyVisionTorch(embed_dim=cfg.embed_dim, heads=cfg.heads,
                                 ffn=cfg.ffn, depth=cfg.depth,
                                 patch=cfg.patch, merge=cfg.merge,
                                 out_hidden=cfg.out_hidden,
                                 eps=cfg.rms_eps)
        seed_all(t, seed=23)
        f = MonkeyVisionModel(cfg)
        h = w = 4
        hp, wp = mineru_vision_positions(h, w, cfg.merge)
        cos, sin = _qwen_vision_rope(hp, wp, cfg.head_dim, cfg.rope_theta)
        pd = 3 * cfg.patch ** 2
        patches = np.random.default_rng(5).normal(
            size=(h * w, pd)).astype(np.float32)
        params = f.init(jax.random.PRNGKey(0), jnp.asarray(patches),
                        jnp.asarray(cos), jnp.asarray(sin))
        cm = build_hunyuan_map(params, name="monkey-vision")
        fixture = hf_state_dict(t)
        tree = cm.convert(fixture, strict=True)
        assert cm.unused_sources(fixture) == []
        with torch.no_grad():
            ref = t(torch.from_numpy(patches), torch.from_numpy(cos),
                    torch.from_numpy(sin)).numpy()
        ours = f.apply(tree, jnp.asarray(patches), jnp.asarray(cos),
                       jnp.asarray(sin))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4,
                                   rtol=1e-3)

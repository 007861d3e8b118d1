"""Multi-device data-parallel pipeline step on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from oar_ocr_tpu.parallel.mesh import (build_mesh, data_sharding, replicate,
                                       shard_batch)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestDataParallel:
    def test_mesh_shapes(self):
        mesh = build_mesh(n_data=8)
        assert dict(mesh.shape) == {"data": 8, "model": 1}
        mesh2 = build_mesh(n_data=4, n_model=2)
        assert dict(mesh2.shape) == {"data": 4, "model": 2}

    def test_shard_and_replicate(self):
        mesh = build_mesh(n_data=8)
        x = shard_batch(mesh, np.arange(16, dtype=np.float32).reshape(8, 2))
        assert len(x.sharding.device_set) == 8
        p = replicate(mesh, {"w": np.ones((3,), np.float32)})
        assert len(p["w"].sharding.device_set) == 8

    def test_dp_ocr_step_executes(self):
        from oar_ocr_tpu.models.detection.db import DBNet
        from oar_ocr_tpu.models.recognition.svtr import SVTRRecognizer
        from oar_ocr_tpu.parallel.dp import make_dp_ocr_step
        from oar_ocr_tpu.runtime.runtime import init_params

        mesh = build_mesh(n_data=8)
        det = DBNet(backbone_scale=0.5)
        rec = SVTRRecognizer(vocab_size=32, backbone_scale=0.5, svtr_depth=1)
        det_p = replicate(mesh, init_params(det, (1, 64, 64, 3)))
        rec_p = replicate(mesh, init_params(rec, (1, 48, 64, 3)))

        rng = np.random.default_rng(0)
        n, m = 8, 16
        pages = shard_batch(mesh, rng.integers(0, 255, (n, 64, 64, 3),
                                               dtype=np.uint8))
        eye = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
        step = make_dp_ocr_step(det, rec, mesh, det_hw=(64, 64), rec_w=64)
        prob, idx, p, keep = step(
            det_p, rec_p, pages, shard_batch(mesh, eye),
            shard_batch(mesh, np.full((n,), 64, np.int32)),
            shard_batch(mesh, np.full((n,), 64, np.int32)),
            shard_batch(mesh, np.tile(np.eye(3, dtype=np.float32)[None],
                                      (m, 1, 1))),
            shard_batch(mesh, np.repeat(np.arange(n, dtype=np.int32), 2)),
            shard_batch(mesh, np.full((m,), 64, np.int32)))
        jax.block_until_ready(prob)
        assert prob.shape == (n, 64, 64)
        assert len(prob.sharding.device_set) == 8   # output stays sharded
        assert idx.shape[0] == m

    def test_dp_matches_single_device(self):
        """8-way DP produces the same numbers as a plain single-device
        forward on identical inputs — batch sharding must not change
        per-example math (SURVEY §2.7: DP over pages is the v5e-8
        strategy; correctness means shard-count invariance)."""
        from oar_ocr_tpu.models.detection.db import DBNet
        from oar_ocr_tpu.models.recognition.svtr import SVTRRecognizer
        from oar_ocr_tpu.parallel.dp import make_dp_ocr_step
        from oar_ocr_tpu.runtime.runtime import init_params

        mesh = build_mesh(n_data=8)
        det = DBNet(backbone_scale=0.5)
        rec = SVTRRecognizer(vocab_size=32, backbone_scale=0.5,
                             svtr_depth=1)
        det_p0 = init_params(det, (1, 64, 64, 3))
        rec_p0 = init_params(rec, (1, 48, 64, 3))

        rng = np.random.default_rng(7)
        n, m = 8, 16
        pages_np = rng.integers(0, 255, (n, 64, 64, 3), dtype=np.uint8)
        eye_n = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
        eye_m = np.tile(np.eye(3, dtype=np.float32)[None], (m, 1, 1))
        full_n = np.full((n,), 64, np.int32)
        rec_idx = np.repeat(np.arange(n, dtype=np.int32), 2)
        rec_w = np.full((m,), 64, np.int32)

        def run(mesh_):
            step = make_dp_ocr_step(det, rec, mesh_, det_hw=(64, 64),
                                    rec_w=64)
            return step(
                replicate(mesh_, det_p0), replicate(mesh_, rec_p0),
                shard_batch(mesh_, pages_np), shard_batch(mesh_, eye_n),
                shard_batch(mesh_, full_n), shard_batch(mesh_, full_n),
                shard_batch(mesh_, eye_m), shard_batch(mesh_, rec_idx),
                shard_batch(mesh_, rec_w))

        prob_dp, idx_dp, p_dp, keep_dp = run(mesh)
        prob_1, idx_1, p_1, keep_1 = run(build_mesh(n_data=1))

        np.testing.assert_allclose(np.asarray(prob_dp),
                                   np.asarray(prob_1), atol=1e-6,
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx_dp),
                                      np.asarray(idx_1))
        np.testing.assert_array_equal(np.asarray(keep_dp),
                                      np.asarray(keep_1))
        np.testing.assert_allclose(np.asarray(p_dp), np.asarray(p_1),
                                   atol=1e-6, rtol=1e-6)
        assert idx_dp.shape[0] == m


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestMeshPredict:
    """Mesh-parallel execution of the PRODUCTION pipeline: the same
    `OAROCR.predict` users call, with `RuntimeConfig.use_mesh=True`
    sharding det/rec batches over the ``data`` axis (VERDICT r2 item 1 —
    the invariance check lives on predict(), not a toy step)."""

    def _pages(self):
        rng = np.random.default_rng(3)
        pages = []
        for i in range(8):
            img = np.full((200, 160, 3), 255, np.uint8)
            for r in range(3):
                img[30 + 50 * r : 48 + 50 * r, 20:120] = rng.integers(0, 60)
            pages.append(img)
        return pages

    def _build(self, use_mesh):
        from oar_ocr_tpu.config.runtime import RuntimeConfig
        from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
        from oar_ocr_tpu.runtime.runtime import Runtime

        rt = Runtime(RuntimeConfig(use_mesh=use_mesh))
        # thresh below the random-init sigmoid plateau + box_thresh 0 so
        # untrained weights still emit candidate regions (non-vacuous)
        return (OAROCRBuilder("general").with_runtime(rt)
                .with_det_config(thresh=0.48, box_thresh=0.0)
                .with_batch_sizes(image=4, region=16).build())

    def test_predict_mesh_invariance(self):
        pages = self._pages()
        r1 = self._build(False).predict(pages)
        pipe = self._build(True)
        assert pipe.runtime.n_data == 8
        r8 = pipe.predict(pages)
        total = sum(len(r.regions) for r in r1)
        assert total > 0, "vacuous: single-device run found no regions"
        for a_page, b_page in zip(r1, r8):
            assert len(a_page.regions) == len(b_page.regions)
            for a, b in zip(a_page.regions, b_page.regions):
                np.testing.assert_allclose(a.box, b.box, atol=1e-4)
                assert a.text == b.text
                assert abs(a.confidence - b.confidence) < 1e-5

    def test_predict_mesh_adaptive_transfers_invariance(self):
        """All three adaptive transfer paths FORCED ON under the mesh
        (VERDICT r4 item 4): tile-sparse det fetch, kept-only rec CTC
        transfer and the sparse page upload. The gather programs are
        batch-parallel (per-row top_k + take_along_axis), so GSPMD
        shards them over ``data``; the compressed upload payload places
        replicated like the dense batch. Output must be identical to
        the plain single-device run."""
        from oar_ocr_tpu.config.runtime import RuntimeConfig
        from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
        from oar_ocr_tpu.runtime.runtime import Runtime

        pages = self._pages()
        r1 = self._build(False).predict(pages)
        rt = Runtime(RuntimeConfig(use_mesh=True, det_sparse_fetch="on",
                                   rec_kept_fetch="on", page_upload="on"))
        pipe = (OAROCRBuilder("general").with_runtime(rt)
                .with_det_config(thresh=0.48, box_thresh=0.0)
                .with_batch_sizes(image=4, region=16).build())
        assert pipe.runtime.n_data == 8
        assert rt.det_sparse_active() and rt.rec_kept_active()
        r8 = pipe.predict(pages)
        total = sum(len(r.regions) for r in r1)
        assert total > 0, "vacuous: single-device run found no regions"
        for a_page, b_page in zip(r1, r8):
            assert len(a_page.regions) == len(b_page.regions)
            for a, b in zip(a_page.regions, b_page.regions):
                np.testing.assert_allclose(a.box, b.box, atol=1e-4)
                assert a.text == b.text
                assert abs(a.confidence - b.confidence) < 1e-5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestTensorParallel:
    """Megatron-style TP over the ``model`` axis (parallel/tp.py):
    column-sharded q/k/v + gate/up + lm_head, row-sharded o + down.
    Correctness = placement invariance: a 2x4 (data x model) mesh must
    reproduce the replicated single-layout logits bit-for-tolerance."""

    def _decoder_run(self, params_placed, module, cfg, embeds, positions,
                     n_steps=3):
        import jax.numpy as jnp

        from oar_ocr_tpu.vl.kv_cache import KVCache

        b, t = embeds.shape[:2]
        cap = 32

        def step(params, embeds, positions):
            cache = KVCache.create(cfg.layers, b, cfg.kv_heads, cap,
                                   cfg.head_dim, dtype=jnp.float32)
            from oar_ocr_tpu.vl.attention import (combine_masks,
                                                  create_causal_mask)

            mask = jnp.broadcast_to(create_causal_mask(t), (b, 1, t, t))
            mask = jnp.concatenate(
                [mask, jnp.zeros((b, 1, t, cap - t), bool)], -1)
            logits, _, cache, _ = module.apply(
                params, embeds, positions, cache, mask,
                method="prefill")
            cache = cache.advance(t)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            outs = [logits]
            for i in range(n_steps):
                pos = jnp.full((1, b, 1), t + i, jnp.int32)
                logits, _, cache, _ = module.apply(
                    params, tok, pos, cache, t + i,
                    method="decode_step")
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
                outs.append(logits)
            return jnp.stack(outs)

        return np.asarray(jax.jit(step)(params_placed, embeds, positions))

    def test_tp_matches_replicated(self):
        import jax.numpy as jnp

        from oar_ocr_tpu.parallel.tp import (param_shardings,
                                             partition_params, tp_spec)
        from oar_ocr_tpu.vl.decoder import CausalLM, DecoderConfig

        cfg = DecoderConfig(vocab_size=64, hidden=128, layers=2, heads=8,
                            kv_heads=4, ffn=256)
        module = CausalLM(cfg)
        b, t = 4, 6
        rng = np.random.default_rng(11)
        embeds = jnp.asarray(rng.normal(size=(b, t, cfg.hidden)),
                             jnp.float32)
        positions = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None, None], (1, b, t))
        from oar_ocr_tpu.vl.kv_cache import KVCache

        cache0 = KVCache.create(cfg.layers, b, cfg.kv_heads, 32,
                                cfg.head_dim, dtype=jnp.float32)
        # init via decode_step: it touches tok_emb + trunk + lm_head
        # (prefill alone never creates the embedding table)
        params = module.init(jax.random.PRNGKey(0),
                             jnp.zeros((b,), jnp.int32),
                             jnp.zeros((1, b, 1), jnp.int32),
                             cache0, 0, method="decode_step")

        ref = self._decoder_run(params, module, cfg, embeds, positions)

        mesh = build_mesh(n_data=2, n_model=4)
        placed = partition_params(params, mesh)
        # sanity: TP actually shards something over ``model``
        shardings = jax.tree_util.tree_leaves(param_shardings(params, mesh))
        assert any("model" in str(s.spec) for s in shardings)
        got = self._decoder_run(placed, module, cfg, embeds, positions)

        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)

    def test_tp_production_family_generate(self):
        """TP reachable from the public API: a VLMFamily built on a
        Runtime with a (data, model) mesh places its decoder params
        tensor-parallel (runtime.put_params_vl) and generate() output is
        identical to the single-device run."""
        from oar_ocr_tpu.config.runtime import MeshConfig, RuntimeConfig
        from oar_ocr_tpu.runtime.runtime import Runtime
        from oar_ocr_tpu.vl.families import GLMOCR

        img = np.random.default_rng(3).integers(
            0, 255, (48, 64, 3), dtype=np.uint8)
        base = GLMOCR(tiny=True)
        ref = base.generate([img], "ocr", max_new_tokens=6)

        rt = Runtime(RuntimeConfig(use_mesh=True,
                                   mesh=MeshConfig(n_model=2)))
        assert rt.n_data == 4 and rt.n_model == 2
        tp = GLMOCR(jax.device_get(base.params), tiny=True, runtime=rt)
        specs = {str(l.sharding.spec)
                 for l in jax.tree_util.tree_leaves(tp.params)}
        assert any("model" in s for s in specs), specs
        assert tp.generate([img], "ocr", max_new_tokens=6) == ref

    def test_tp_env_knob(self, monkeypatch):
        from oar_ocr_tpu.config.runtime import RuntimeConfig

        monkeypatch.setenv("OAR_TPU_TP", "2")
        cfg = RuntimeConfig.from_env()
        assert cfg.mesh.n_model == 2
        mesh = cfg.mesh.build()
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    def test_tp_spec_rules(self):
        from jax.sharding import PartitionSpec as P

        from oar_ocr_tpu.parallel.tp import tp_spec

        k2 = np.zeros((4, 4))
        assert tp_spec(("a", "q_proj", "kernel"), k2) == P(None, "model")
        assert tp_spec(("a", "down_proj", "kernel"), k2) == P("model", None)
        assert tp_spec(("a", "lm_head", "kernel"), k2) == P(None, "model")
        assert tp_spec(("a", "o", "kernel"), k2) == P("model", None)
        assert tp_spec(("a", "input_norm", "scale"),
                       np.zeros((4,))) == P()
        assert tp_spec(("a", "q_proj", "bias"), np.zeros((4,))) == \
            P("model")
        assert tp_spec(("a", "tok_emb", "embedding"), k2) == P()
        # flax stores dotted layer names as one key (hunyuan.py
        # name="self_attn.q_proj"): the last dot component must match
        assert tp_spec(("a", "self_attn.q_proj", "kernel"), k2) == \
            P(None, "model")
        assert tp_spec(("a", "mlp.down_proj", "kernel"), k2) == \
            P("model", None)

    def test_mesh_explicit_shape_with_model_axis(self):
        from oar_ocr_tpu.config.runtime import MeshConfig
        from oar_ocr_tpu.errors import ConfigError

        mesh = MeshConfig(shape=(8,), n_model=2).build()
        assert dict(mesh.shape) == {"data": 4, "model": 2}
        with pytest.raises(ConfigError):
            MeshConfig(shape=(8,), n_model=3).build()

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oar_ocr_tpu.vl.diffusion import (MASK_ID, decode_block, transfer_count,
                                      unmask_step)
from oar_ocr_tpu.vl.gated_delta import gated_delta_rule, gated_delta_step
from oar_ocr_tpu.vl.kv_cache import KVCache
from oar_ocr_tpu.vl.speculative import (MTPDraftState, recurrent_draft,
                                        rollback_cache, verify_draft)


class TestGatedDelta:
    def test_matches_naive_recurrence(self, rng):
        b, h, t, dk, dv = 1, 2, 5, 4, 3
        q = rng.normal(size=(b, h, t, dk)).astype(np.float32)
        k = rng.normal(size=(b, h, t, dk)).astype(np.float32)
        v = rng.normal(size=(b, h, t, dv)).astype(np.float32)
        a = rng.uniform(0.8, 1.0, size=(b, h, t)).astype(np.float32)
        be = rng.uniform(0.1, 0.9, size=(b, h, t)).astype(np.float32)

        out = np.asarray(gated_delta_rule(*map(jnp.asarray, (q, k, v, a, be))))

        # naive reference
        ref = np.zeros((b, h, t, dv), np.float32)
        for bi in range(b):
            for hi in range(h):
                s = np.zeros((dk, dv), np.float32)
                for ti in range(t):
                    kt = k[bi, hi, ti]
                    vt = v[bi, hi, ti]
                    s = a[bi, hi, ti] * (s - be[bi, hi, ti]
                                         * np.outer(kt, kt @ s))
                    s = s + be[bi, hi, ti] * np.outer(kt, vt)
                    ref[bi, hi, ti] = s.T @ q[bi, hi, ti]
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_step_consistent_with_scan(self, rng):
        b, h, t, dk, dv = 1, 1, 4, 3, 3
        args = [rng.normal(size=(b, h, t, d)).astype(np.float32)
                for d in (dk, dk, dv)]
        a = rng.uniform(0.9, 1.0, size=(b, h, t)).astype(np.float32)
        be = rng.uniform(0.2, 0.8, size=(b, h, t)).astype(np.float32)
        full = np.asarray(gated_delta_rule(*map(jnp.asarray, (*args, a, be))))
        s = jnp.zeros((b, h, dk, dv))
        for ti in range(t):
            s, o = gated_delta_step(
                s, *(jnp.asarray(x[:, :, ti]) for x in args),
                jnp.asarray(a[:, :, ti]), jnp.asarray(be[:, :, ti]))
            np.testing.assert_allclose(np.asarray(o)[0, 0],
                                       full[0, 0, ti], atol=1e-4)


class TestSpeculative:
    def test_all_accepted(self):
        draft = jnp.asarray([[5, 6, 7]], jnp.int32)
        logits = np.full((1, 4, 10), -5.0, np.float32)
        for i, t in enumerate([5, 6, 7, 8]):
            logits[0, i, t] = 5.0
        res = verify_draft(draft, jnp.asarray(logits))
        assert int(res.accepted[0]) == 3
        assert res.next_tokens[0, :4].tolist() == [5, 6, 7, 8]

    def test_partial_accept_with_correction(self):
        draft = jnp.asarray([[5, 6, 7]], jnp.int32)
        logits = np.full((1, 4, 10), -5.0, np.float32)
        for i, t in enumerate([5, 9, 7, 8]):   # disagrees at position 1
            logits[0, i, t] = 5.0
        res = verify_draft(draft, jnp.asarray(logits))
        assert int(res.accepted[0]) == 1
        assert res.next_tokens[0, :2].tolist() == [5, 9]
        assert int(res.num_emitted[0]) == 2
        # beyond emitted → -1 padding
        assert res.next_tokens[0, 2] == -1

    def test_none_accepted(self):
        draft = jnp.asarray([[3]], jnp.int32)
        logits = np.zeros((1, 2, 5), np.float32)
        logits[0, 0, 4] = 9.0
        res = verify_draft(draft, jnp.asarray(logits))
        assert int(res.accepted[0]) == 0
        assert int(res.next_tokens[0, 0]) == 4

    def test_rollback(self):
        cache = KVCache.create(1, 1, 1, 16, 4).advance(10)
        cache = rollback_cache(cache, jnp.asarray(6))
        assert int(cache.length[0]) == 6

    def test_recurrent_draft(self):
        def step(h, tok):
            logits = jnp.zeros((1, 10)).at[0, tok[0] + 1].set(5.0)
            return h + 1.0, logits

        drafts, state = recurrent_draft(
            step, MTPDraftState(jnp.zeros((1, 4)), jnp.asarray([2])), 3)
        assert drafts[0].tolist() == [3, 4, 5]


class TestDiffusion:
    def test_transfer_schedule_monotone(self):
        counts = [transfer_count(s, 8, 32) for s in range(8)]
        assert counts[-1] == 32
        assert all(b >= a for a, b in zip(counts, counts[1:]))

    def test_unmask_commits_confident(self):
        tokens = jnp.full((1, 4), MASK_ID, jnp.int32)
        logits = np.zeros((1, 4, 8), np.float32)
        logits[0, 0, 3] = 20.0     # very confident
        logits[0, 1, 2] = 0.1      # not confident
        out = unmask_step(tokens, jnp.asarray(logits),
                          confidence_threshold=0.9, min_transfer=1)
        out = np.asarray(out)
        assert out[0, 0] == 3
        assert (out == MASK_ID).sum() == 3  # only the confident one + min

    def test_decode_block_completes(self):
        def predictor(tokens):
            b, l = tokens.shape
            logits = jnp.zeros((b, l, 6))
            return logits.at[..., 4].set(10.0)   # always predict 4

        out = np.asarray(decode_block(predictor, 8, 2, num_steps=4,
                                      confidence_threshold=0.5))
        assert (out == 4).all()

    def test_decode_block_respects_existing(self):
        def predictor(tokens):
            return jnp.zeros((tokens.shape[0], tokens.shape[1], 6)) \
                .at[..., 1].set(8.0)

        out = np.asarray(decode_block(predictor, 4, 1, num_steps=2,
                                      confidence_threshold=0.0))
        assert (out != MASK_ID).all()


class TestChunkedGatedDelta:
    """Blockwise gated delta rule ≡ sequential scan (the oracle) —
    VERDICT r2 item 8; SURVEY §7 'associative-scan formulation'."""

    def test_matches_sequential(self):
        import jax.numpy as jnp

        from oar_ocr_tpu.vl.gated_delta import (gated_delta_rule,
                                                gated_delta_rule_chunked)

        rng = np.random.default_rng(0)
        for (b, h, t, dk, dv, c) in [(2, 3, 37, 16, 24, 8),
                                     (1, 2, 64, 32, 32, 64),
                                     (2, 1, 130, 8, 8, 32)]:
            q = rng.standard_normal((b, h, t, dk)).astype(np.float32)
            k = rng.standard_normal((b, h, t, dk)).astype(np.float32) * 0.3
            v = rng.standard_normal((b, h, t, dv)).astype(np.float32)
            a = 1 / (1 + np.exp(-rng.standard_normal((b, h, t))))
            be = 1 / (1 + np.exp(-rng.standard_normal((b, h, t))))
            s0 = rng.standard_normal((b, h, dk, dv)).astype(np.float32) * 0.2
            o_ref, s_ref = gated_delta_rule(
                q, k, v, a.astype(np.float32), be.astype(np.float32), s0,
                return_state=True)
            o_chk, s_chk = gated_delta_rule_chunked(
                q, k, v, a.astype(np.float32), be.astype(np.float32), s0,
                chunk=c, return_state=True)
            assert float(jnp.max(jnp.abs(o_ref - o_chk))) < 1e-4
            assert float(jnp.max(jnp.abs(s_ref - s_chk))) < 1e-4

    def test_ovis_decoder_prefill_uses_chunked(self, monkeypatch):
        """The Ovis hybrid decoder's prefill (T>1) produces identical
        hidden states through the chunked and sequential paths."""
        import jax
        import jax.numpy as jnp

        from oar_ocr_tpu.vl.llm_decoders import (OVIS_TEXT, UnifiedDecoder,
                                                 dataclasses)
        from oar_ocr_tpu.vl.kv_cache import KVCache

        c = dataclasses.replace(
            OVIS_TEXT, vocab_size=64, hidden=32, layers=4, heads=4,
            kv_heads=2, head_dim=8, ffn=48, linear_k_heads=2,
            linear_v_heads=4, linear_head_dim=8)
        dec = UnifiedDecoder(c)
        t, cap, b = 12, 16, 1
        embeds = jnp.asarray(np.random.default_rng(0).standard_normal(
            (b, t, c.hidden)), jnp.float32)
        pids = jnp.arange(t)[None]
        cache = KVCache.create(c.layers, b, c.kv_heads, cap, c.head_dim,
                               dtype=jnp.float32)
        mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
        mask = jnp.concatenate(
            [mask, jnp.zeros((1, 1, t, cap - t), bool)], -1)
        d = c.linear_head_dim
        ds = jnp.zeros((c.layers, b, c.linear_v_heads, d, d), jnp.float32)
        cv = jnp.zeros((c.layers, b, max(c.conv_kernel - 1, 1),
                        2 * c.linear_k_heads * d + c.linear_v_heads * d),
                       jnp.float32)
        params = dec.init(jax.random.PRNGKey(0), embeds, pids, cache,
                          jnp.int32(0), mask, ds, cv)

        def run():
            h, _, ds2, _ = dec.apply(params, embeds, pids, cache,
                                     jnp.int32(0), mask, ds, cv)
            return np.asarray(h), np.asarray(ds2)

        h_chunked, ds_chunked = run()
        monkeypatch.setenv("OAR_TPU_NO_CHUNKED_DELTA", "1")
        h_seq, ds_seq = run()
        np.testing.assert_allclose(h_chunked, h_seq, atol=1e-4)
        np.testing.assert_allclose(ds_chunked, ds_seq, atol=1e-4)

import jax.numpy as jnp
import numpy as np
import pytest

from oar_ocr_tpu.ops.ctc import (CTCLabelDecoder, argmax_last,
                                 ctc_greedy_decode, default_charset)


def test_argmax_last_tiebreak():
    """decode.rs:27-31 — ties resolve to the LAST max index."""
    x = jnp.array([[1.0, 3.0, 3.0, 2.0]])
    assert int(argmax_last(x)[0]) == 2
    y = jnp.array([[5.0, 5.0, 5.0]])
    assert int(argmax_last(y)[0]) == 2


def test_greedy_decode_dedup_and_blank():
    """keep iff idx != blank and idx != prev (dedup before blank filter)."""
    # timeline: a a blank a b b  → "aab"
    v = 4  # blank, a, b, c
    seq = [1, 1, 0, 1, 2, 2]
    probs = np.full((1, len(seq), v), 0.01, np.float32)
    for t, s in enumerate(seq):
        probs[0, t, s] = 0.9
    raw = ctc_greedy_decode(jnp.asarray(probs))
    np.testing.assert_array_equal(
        np.asarray(raw.keep)[0], [True, False, False, True, True, False])
    dec = CTCLabelDecoder(["a", "b", "c"], use_space_char=False)
    [(text, conf)] = dec(tuple(np.asarray(a) for a in raw))
    assert text == "aab"
    assert conf == pytest.approx(0.9, abs=1e-5)


def test_confidence_zero_when_empty():
    probs = np.zeros((1, 3, 4), np.float32)
    probs[:, :, 0] = 1.0  # all blank
    raw = ctc_greedy_decode(jnp.asarray(probs))
    dec = CTCLabelDecoder(["a", "b", "c"], use_space_char=False)
    [(text, conf)] = dec(tuple(np.asarray(a) for a in raw))
    assert text == "" and conf == 0.0


def test_valid_length_masking():
    probs = np.zeros((1, 4, 3), np.float32)
    probs[0, :, 1] = 1.0
    probs[0, 1, 1] = 0.0
    probs[0, 1, 2] = 1.0
    raw = ctc_greedy_decode(jnp.asarray(probs),
                            valid_lengths=jnp.array([2]))
    # only first 2 timesteps can contribute
    assert np.asarray(raw.keep)[0, 2:].sum() == 0


def test_logits_path_matches_probs():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 5, 7)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    a = ctc_greedy_decode(jnp.asarray(logits), inputs_are_logits=True)
    b = ctc_greedy_decode(jnp.asarray(probs))
    np.testing.assert_array_equal(np.asarray(a.indices), np.asarray(b.indices))
    np.testing.assert_allclose(np.asarray(a.probs), np.asarray(b.probs),
                               atol=1e-4)


def test_space_char_appended():
    dec = CTCLabelDecoder(["a"], use_space_char=True)
    assert dec.charset == ["a", " "]
    assert dec.vocab_size == 3


def test_default_charset_printable():
    cs = default_charset()
    assert "A" in cs and "0" in cs and " " not in cs


def test_pack_ctc_raw_round_trip():
    """The 6-byte transfer packing (int16 idx + f32 prob) is exact: keep
    and kept indices round-trip, probs round-trip to the ulp everywhere,
    and 0xFF padding rows decode as keep=False (merge_dispatched pads
    sub-batches to the widest timestep count with 0xFF)."""
    from oar_ocr_tpu.ops.ctc import CTCRaw, pack_ctc_raw, unpack_ctc_raw

    rng = np.random.default_rng(0)
    b, t = 5, 17
    idx = rng.integers(0, 18000, (b, t)).astype(np.int32)
    prob = rng.random((b, t)).astype(np.float32)
    keep = rng.random((b, t)) < 0.4
    packed = np.asarray(pack_ctc_raw(CTCRaw(
        jnp.asarray(idx), jnp.asarray(prob), jnp.asarray(keep))))
    assert packed.shape == (b, t, 6) and packed.dtype == np.uint8
    i2, p2, k2 = unpack_ctc_raw(packed)
    np.testing.assert_array_equal(k2, keep)
    np.testing.assert_array_equal(i2[keep], idx[keep])
    np.testing.assert_array_equal(p2, prob)
    pad = np.full((b, 3, 6), 255, np.uint8)
    _, _, k3 = unpack_ctc_raw(np.concatenate([packed, pad], axis=1))
    assert not k3[:, t:].any()


def test_decoder_rejects_oversized_charset():
    from oar_ocr_tpu.errors import InvalidInputError

    with pytest.raises(InvalidInputError):
        CTCLabelDecoder([chr(i) for i in range(40000)])


def test_gather_kept_ctc_round_trip(rng):
    """Kept-only payload (count + cols + entries) reconstructs (idx,
    probs, keep) identically to the full unpack wherever keep is set —
    the only positions the decoder reads — and reports overflow."""
    from oar_ocr_tpu.ops.ctc import (gather_kept_ctc, pack_ctc_raw,
                                     unpack_ctc_raw, unpack_kept_ctc)
    from oar_ocr_tpu.ops.ctc import CTCRaw

    b, t, v = 5, 64, 97
    probs = rng.random((b, t, v)).astype(np.float32)
    # sparsify: most steps blank (realistic text density)
    blanky = rng.random((b, t)) < 0.8
    probs[blanky, 0] = 2.0
    raw = ctc_greedy_decode(jnp.asarray(probs))
    packed = pack_ctc_raw(raw)
    fi, fp, fk = unpack_ctc_raw(np.asarray(packed))
    kmax = int(fk.sum(axis=1).max())
    for k in (kmax, kmax + 3, t // 2):
        if kmax > k:
            continue
        payload = np.asarray(gather_kept_ctc(packed, k=k))
        assert payload.shape == (b, 4 + 8 * k)
        got = unpack_kept_ctc(payload, k, t)
        assert got is not None, k
        gi, gp, gk = got
        np.testing.assert_array_equal(gk, fk)
        np.testing.assert_array_equal(gi[fk], fi[fk])
        np.testing.assert_array_equal(gp[fk], fp[fk])
    if kmax > 1:
        payload = np.asarray(gather_kept_ctc(packed, k=kmax - 1))
        assert unpack_kept_ctc(payload, kmax - 1, t) is None  # overflow


def test_kept_budget_predictor():
    from oar_ocr_tpu.models.recognition.recognizer import CTCRecognizer

    rec = CTCRecognizer.__new__(CTCRecognizer)
    t = 320
    assert rec._kept_budget(t) == t // 2          # no history → safe half
    rec._note_kept_kmax(t, 12)
    k = rec._kept_budget(t)
    assert k in rec._kept_budgets(t) and k >= int(12 * 1.3) + 2
    rec._note_kept_kmax(t, 200)                   # rises instantly
    assert rec._kept_hist[t] == 200
    # too dense for any budget → None (sub rides the full transfer)
    assert rec._kept_budget(t) is None
    for _ in range(60):                           # decays back down
        rec._note_kept_kmax(t, 10)
    assert rec._kept_budget(t) is not None and rec._kept_budget(t) < 64

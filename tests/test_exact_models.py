"""Exact end-to-end VLM drivers (tower + decoder + LM head under the
checkpoint roots): smoke-generate every family and assert the tree roots
match the checkpoints'."""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oar_ocr_tpu.vl.exact_models import (glm_exact, hpd_exact,
                                         mineru_exact, monkey_exact,
                                         ovis_exact, qwen2vl_positions)

FACTORIES = {"mineru": mineru_exact, "glm": glm_exact, "ovis": ovis_exact,
             "hpd": hpd_exact, "monkey": monkey_exact}


@pytest.mark.parametrize("name", sorted(FACTORIES))
def test_generate_smoke(name):
    m = FACTORIES[name](tiny=True)
    img = np.random.default_rng(0).integers(0, 255, (24, 40, 3),
                                            dtype=np.uint8)
    out = m.generate([img], max_new_tokens=6)
    assert len(out) == 1 and isinstance(out[0], str)
    # greedy determinism
    assert out == m.generate([img], max_new_tokens=6)


def test_mineru_tree_roots():
    from oar_ocr_tpu.runtime.ppocr_maps import hf_vl_name
    from oar_ocr_tpu.runtime.weights import flatten_params

    m = mineru_exact(tiny=True)
    names = {hf_vl_name(k) for k in flatten_params(m.params)}
    for expected in [
        "visual.patch_embed.proj.weight",
        "visual.blocks.0.attn.qkv.weight",
        "visual.merger.mlp.0.weight",
        "model.embed_tokens.weight",
        "model.layers.0.self_attn.q_proj.bias",   # Qwen2-VL qkv bias
        "model.norm.weight",
        "lm_head.weight",
    ]:
        assert expected in names, expected


def test_glm_tree_roots():
    from oar_ocr_tpu.runtime.ppocr_maps import hf_vl_name
    from oar_ocr_tpu.runtime.weights import flatten_params

    m = glm_exact(tiny=True)
    names = {hf_vl_name(k) for k in flatten_params(m.params)}
    for expected in [
        "model.visual.blocks.0.attn.q_norm.weight",
        "model.visual.merger.post_projection_norm.weight",
        "model.language_model.layers.0.mlp.gate_up_proj.weight",
        "model.language_model.layers.0.post_self_attn_layernorm.weight",
        "lm_head.weight",
    ]:
        assert expected in names, expected


def test_qwen2vl_positions_rule():
    # text(2) + image 2x2 merged grid (4 tokens) + text(2)
    pos = qwen2vl_positions(8, 2, 4, (4, 4), 2)
    np.testing.assert_array_equal(pos[:, :2], [[0, 1]] * 3)
    # image: t stays at base 2; h = 2 + row; w = 2 + col
    np.testing.assert_array_equal(pos[0, 2:6], [2, 2, 2, 2])
    np.testing.assert_array_equal(pos[1, 2:6], [2, 2, 3, 3])
    np.testing.assert_array_equal(pos[2, 2:6], [2, 3, 2, 3])
    # trailing text resumes at max+1 = 4
    np.testing.assert_array_equal(pos[:, 6:], [[4, 5]] * 3)


def test_exact_from_registry():
    from oar_ocr_tpu.errors import InvalidInputError
    from oar_ocr_tpu.vl.exact_models import (EXACT_FACTORIES,
                                             exact_from_registry)
    from oar_ocr_tpu.registry.models import MODEL_REGISTRY

    # every VLM registry entry resolves to an exact factory or module
    for name, entry in MODEL_REGISTRY.items():
        if entry.task != "vlm":
            continue
        assert (name in EXACT_FACTORIES
                or name.startswith(("paddleocr-vl", "hunyuanocr"))
                or name == "mineru-diffusion-v1"), name
    m = exact_from_registry("glm-ocr", tiny=True)
    assert m.spec.name == "glmocr"
    with pytest.raises(InvalidInputError):
        exact_from_registry("nope")


def test_mineru_diffusion_exact():
    from oar_ocr_tpu.vl.exact_models import mineru_diffusion_exact

    m = mineru_diffusion_exact(tiny=True)
    img = np.random.default_rng(0).integers(0, 255, (24, 40, 3),
                                            dtype=np.uint8)
    out = m.generate([img], max_new_tokens=12, block_len=4,
                     num_unmask_steps=3)
    assert len(out) == 1 and isinstance(out[0], str)
    assert out == m.generate([img], max_new_tokens=12, block_len=4,
                             num_unmask_steps=3)
    # registry resolution
    from oar_ocr_tpu.vl.exact_models import exact_from_registry

    assert isinstance(exact_from_registry("mineru-diffusion-v1", tiny=True),
                      type(m))


def test_glm_mtp_speculative_exactness():
    from oar_ocr_tpu.vl.exact_models import (glm_exact,
                                             glm_speculative_exact)

    img = np.random.default_rng(2).integers(0, 255, (24, 40, 3),
                                            dtype=np.uint8)
    for seed in (5, 12):
        spec = glm_speculative_exact(tiny=True, seed=seed)
        plain = glm_exact(tiny=True, seed=seed)
        s_out = spec.generate_speculative([img], max_new_tokens=10)
        p_out = plain.generate([img], max_new_tokens=10)
        assert s_out == p_out, (seed, s_out, p_out)


def test_hpd_fork_exact():
    """Continuous-batching fork scheduler on the exact HPD stack
    (hpd_parsing/model.rs:467-723): children fork from the parent's KV
    at the fork position and join the running decode batch."""
    from oar_ocr_tpu.vl.exact_models import hpd_fork_exact

    m = hpd_fork_exact(tiny=True, seed=4)
    img = np.random.default_rng(0).integers(0, 255, (24, 40, 3),
                                            dtype=np.uint8)
    out = m.parse_with_forks(img, max_new_tokens=8)
    assert {"parent", "children", "stats", "token_ids"} <= set(out)
    assert isinstance(out["parent"], str)
    st = out["stats"]       # HpdRuntimeStats (hpd_parsing/model.rs:71)
    assert st["prefix_len"] > 0
    assert st["num_children"] == len(out["children"])
    assert st["scheduler_rounds"] > 0
    assert st["peak_active_branches"] >= 1


def _forked_model_and_img():
    """A model whose DEV fork id is a token it actually emits — every
    run forks at least once."""
    from oar_ocr_tpu.vl.exact_models import hpd_fork_exact

    img = np.random.default_rng(0).integers(0, 255, (24, 40, 3),
                                            dtype=np.uint8)
    probe = hpd_fork_exact(tiny=True, seed=4)
    base = probe.parse_with_forks(img, max_new_tokens=8)
    fork_id = base["token_ids"][0]

    def make():
        m = hpd_fork_exact(tiny=True, seed=4)
        m.DEV_FORK_ID = int(fork_id)
        return m

    return make, img


def test_hpd_scheduler_determinism():
    """Scheduler output is invariant to interleaving: the continuous
    batch (children admitted mid-decode, max_active default) emits
    exactly what a fully sequential schedule (max_active_branches=1,
    i.e. the two-wave order) emits — the determinism bar of VERDICT r2
    item 5."""
    make, img = _forked_model_and_img()
    cont = make().parse_with_forks(img, max_new_tokens=8)
    assert cont["stats"]["forked_branches"] >= 1
    assert cont["stats"]["peak_active_branches"] >= 2
    seq = make().parse_with_forks(img, max_new_tokens=8,
                                  max_active_branches=1)
    assert seq["stats"]["peak_active_branches"] == 1
    assert cont["token_ids"] == seq["token_ids"]
    assert cont["children"] == seq["children"]


def test_hpd_pmtp_greedy_exact():
    """Per-branch P-MTP speculation emits exactly the greedy stream
    (speculative decoding is output-invariant), and the draft counters
    move (model.rs:605-702; DEFAULT_SPECULATIVE_TOKENS=6)."""
    make, img = _forked_model_and_img()
    greedy = make().parse_with_forks(img, max_new_tokens=8)
    mtp = make().parse_with_forks(img, max_new_tokens=8, use_mtp=True,
                                  num_speculative_tokens=3)
    assert mtp["token_ids"] == greedy["token_ids"]
    assert mtp["stats"]["mtp_drafted_tokens"] > 0
    assert mtp["stats"]["mtp_accepted_tokens"] >= 0
    assert (mtp["stats"]["mtp_accepted_tokens"]
            <= mtp["stats"]["mtp_drafted_tokens"])


def test_batched_generate_matches_singles():
    """Left-padded batch-N decode is bit-identical to per-image decode
    (pad rows masked via KVCache.pad — the attention.rs:660-692 rule)."""
    from oar_ocr_tpu.vl.exact_models import (hpd_exact, mineru_exact,
                                             ovis_exact)

    # ovis is the load-bearing case: its hybrid DELTA layers have no
    # KV-style pad mask, so left-pad rows must be neutralized in the
    # recurrent fold (β=0, α=1) or the shorter prompts' states diverge
    for fac in (mineru_exact, hpd_exact, ovis_exact):
        m = fac(tiny=True, seed=2)
        imgs = [np.random.default_rng(i).integers(
            0, 255, (24 + 8 * i, 40, 3), dtype=np.uint8)
            for i in range(3)]
        batch = m.generate(imgs, max_new_tokens=6)
        singles = [m.generate([im], max_new_tokens=6)[0] for im in imgs]
        assert batch == singles, (fac.__name__, batch, singles)

import jax
import numpy as np
import pytest

from oar_ocr_tpu.vl.families import (FAMILY_CLASSES, FAMILY_CONFIGS,
                                     GLMOCR, VLMFamily)


def test_family_registry_covers_lineup():
    expected = {"hunyuanocr", "glmocr", "mineru", "mineru_diffusion",
                "hpd_parsing", "ovisocr2", "monkeyocrv2"}
    assert set(FAMILY_CONFIGS) == expected
    assert set(FAMILY_CLASSES) == expected
    assert FAMILY_CONFIGS["hunyuanocr"].decoder.rope_kind == "xdrope"
    assert FAMILY_CONFIGS["ovisocr2"].decoder.layer_pattern == (
        "delta", "delta", "delta", "attn")
    assert FAMILY_CONFIGS["glmocr"].draft_len > 0


@pytest.fixture(scope="module")
def glm():
    return GLMOCR(tiny=True)


@pytest.fixture(scope="module")
def img(  ):
    return np.random.default_rng(0).integers(
        0, 255, (64, 96, 3), dtype=np.uint8)


def test_glm_generate(glm, img):
    out = glm.generate([img], "ocr", max_new_tokens=6)
    assert len(out) == 1 and isinstance(out[0], str)


def test_glm_unknown_task(glm, img):
    from oar_ocr_tpu.errors import InvalidInputError

    with pytest.raises(InvalidInputError):
        glm.generate([img], "nope")


def test_speculative_matches_greedy(glm, img):
    """Exactness: speculative greedy decoding must produce the same text
    as plain greedy decoding (draft quality only affects latency)."""

    greedy = glm.generate([img], "ocr", max_new_tokens=8)[0]
    spec = glm.generate_speculative([img], "ocr", max_new_tokens=8)[0]
    assert spec == greedy


def test_monkeyocr_prompts():
    cfg = FAMILY_CONFIGS["monkeyocrv2"]
    assert "OTSL" in cfg.prompt_templates["table"]


def test_mineru_two_step(img):
    from oar_ocr_tpu.vl.families import MinerU

    fam = MinerU(tiny=True)
    out = fam.parse_two_step(img, max_new_tokens=4)
    assert set(out) == {"layout", "content"}


def test_hpd_fork_parse(img):
    from oar_ocr_tpu.vl.families import HPDParsing

    fam = HPDParsing(tiny=True)
    out = fam.parse_with_forks(img, max_new_tokens=4)
    assert "parent" in out and isinstance(out["children"], list)


def test_mineru_diffusion_block_decode(img):
    from oar_ocr_tpu.vl.families import MinerUDiffusion

    fam = MinerUDiffusion(tiny=True)
    out = fam.generate([img], max_new_tokens=8, num_unmask_steps=3)
    assert len(out) == 1 and isinstance(out[0], str)


def test_hpd_shared_prefix_children(img):
    from oar_ocr_tpu.vl.families import HPDParsing, _tokens_after_subsequence

    assert _tokens_after_subsequence([1, 2, 3, 4, 2, 3, 9], [2, 3]) == [4, 9]
    assert _tokens_after_subsequence([1, 2], [2]) == []
    fam = HPDParsing(tiny=True)
    out = fam.parse_with_forks(img, max_new_tokens=6)
    assert isinstance(out["parent"], str)
    assert isinstance(out["children"], list)


def test_monkey_end2end_parser():
    from oar_ocr_tpu.vl.families import monkey_end2end_to_structure

    text = ('Here: [{"bbox": [0.1, 0.1, 0.5, 0.2], "category": "text", '
            '"text": "hello"}, {"bbox": [100, 300, 900, 400], '
            '"category": "table", "content": "t"}]')
    res = monkey_end2end_to_structure(text, 1000, 800)
    assert len(res.elements) == 2
    assert res.elements[0].text == "hello"
    assert res.elements[0].box[0] == pytest.approx(100.0)   # 0.1 × 1000
    assert res.elements[1].box[1] == pytest.approx(240.0)   # 300/1000 × 800
    # truncated list salvages complete objects
    trunc = '[{"bbox": [0,0,1,1], "category": "text", "text": "a"}, {"bb'
    res2 = monkey_end2end_to_structure(trunc, 100, 100)
    assert len(res2.elements) == 1
    assert monkey_end2end_to_structure("garbage", 10, 10).elements == []

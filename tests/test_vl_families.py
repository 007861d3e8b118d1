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


def test_ovis_family_batched_matches_singles(img):
    """Unequal-length left-padded batch through the hybrid DELTA family
    must reproduce each prompt's batch-1 output: pad rows carry no
    KV-style mask in the recurrent fold, so they are neutralized at
    fold time (β=0, α=1 — decoder.DeltaLayer pad_mask)."""
    from oar_ocr_tpu.vl.families import OvisOCR2

    fam = OvisOCR2(tiny=True)
    img2 = np.random.default_rng(3).integers(
        0, 255, (32, 48, 3), dtype=np.uint8)       # fewer vision tokens
    batch = fam.generate([img, img2], "markdown", max_new_tokens=6)
    singles = [fam.generate([im], "markdown", max_new_tokens=6)[0]
               for im in (img, img2)]
    assert batch == singles


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
    """parse_two_step returns the typed ContentBlock list
    (mineru_layout.rs:27-34); a tiny random model yields no parseable
    `<|box_start|>` lines, so the list may be empty — the mechanics are
    covered deterministically in test_mineru_layout.py."""
    from oar_ocr_tpu.vl.families import MinerU
    from oar_ocr_tpu.vl.mineru_layout import ContentBlock

    fam = MinerU(tiny=True)
    out = fam.parse_two_step(img, max_new_tokens=4)
    assert isinstance(out, list)
    assert all(isinstance(b, ContentBlock) for b in out)


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
    from oar_ocr_tpu.vl.families import HPDParsing, _fork_points

    assert _fork_points([1, 2, 3, 4, 2, 3, 9], [2, 3]) == [(3, 4), (6, 9)]
    assert _fork_points([1, 2], [2]) == []
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


# ---------- official I/O contracts (docs/usage.md:372-500) ----------

class TestOfficialContracts:
    def test_monkey_official_prompts(self):
        from oar_ocr_tpu.vl.families import FAMILY_CONFIGS
        cfg = FAMILY_CONFIGS["monkeyocrv2"]
        assert set(cfg.tasks) == {"end2end", "layout", "text", "table",
                                  "formula"}
        p = cfg.prompt_templates
        assert p["text"] == "Please output the text content from the image."
        assert "OTSL format" in p["table"]
        assert "LaTeX format" in p["formula"]
        assert cfg.task_min_pixels == {"layout": 1_003_520}

    def test_ovis_official_prompt_and_bounds(self):
        from oar_ocr_tpu.vl.families import FAMILY_CONFIGS, OVIS_OCR2_PROMPT
        cfg = FAMILY_CONFIGS["ovisocr2"]
        assert cfg.prompt_templates["markdown"].startswith("\n")
        assert "bbox_{left}_{top}_{right}_{bottom}" in OVIS_OCR2_PROMPT
        assert cfg.min_pixels == 448 * 448
        assert cfg.max_pixels == 2880 * 2880

    def test_layout_min_pixels_raises_resize_floor(self):
        from oar_ocr_tpu.vl.families import FAMILY_CONFIGS, MonkeyOCRv2
        fam = MonkeyOCRv2(tiny=True)
        small = np.full((64, 64, 3), 128, np.uint8)
        p_plain, (gh, gw) = fam._prepare_image(small)
        p_layout, (lh, lw) = fam._prepare_image(
            small, min_pixels=FAMILY_CONFIGS[
                "monkeyocrv2"].task_min_pixels["layout"])
        v = fam.cfg.vision
        assert (lh * v.patch) * (lw * v.patch) >= 1_003_520
        assert lh * lw > gh * gw

    def test_filter_visual_image_tags(self):
        from oar_ocr_tpu.vl.families import filter_visual_image_tags
        text = ('before\n\n<img src="images/bbox_1_2_3_4.jpg" />\n\nafter')
        assert filter_visual_image_tags(text) == "before\n\nafter"
        kept = "a\n\n<img src=\"other.jpg\" />\n\nb"
        assert filter_visual_image_tags(kept) == kept

    def test_clean_truncated_repeats(self):
        from oar_ocr_tpu.vl.families import clean_truncated_repeats
        prefix = "x" * 8000
        text = prefix + "abc" * 60          # 180-char repeated tail
        out = clean_truncated_repeats(text)
        assert out == prefix + "abc"
        short = "abc" * 60                   # under the 8000-char floor
        assert clean_truncated_repeats(short) == short

"""MinerU two-step layout helpers (mineru_layout.rs:36-195 semantics)."""

import numpy as np

from oar_ocr_tpu.vl.mineru_layout import (ContentBlock, LAYOUT_IMAGE_SIZE,
                                          LAYOUT_PROMPT,
                                          parse_layout_output,
                                          prepare_for_extract,
                                          prompt_for_block, run_two_step)


def test_parse_layout_output():
    raw = (
        "<|box_start|>10 20 500 80<|box_end|>"
        "<|ref_start|>title<|ref_end|><|rotate_up|>\n"
        "<|box_start|>10 100 990 400<|box_end|>"
        "<|ref_start|>table<|ref_end|><|rotate_right|>\n"
        "garbage line\n"
        "<|box_start|>10 500 990 600<|box_end|>"
        "<|ref_start|>nonsense_type<|ref_end|>\n"          # bad type
        "<|box_start|>10 700 10 800<|box_end|>"
        "<|ref_start|>text<|ref_end|>\n"                   # zero width
        "<|box_start|>10 900 1500 950<|box_end|>"
        "<|ref_start|>text<|ref_end|>\n")                  # out of range
    blocks = parse_layout_output(raw)
    assert len(blocks) == 2
    assert blocks[0].block_type == "title" and blocks[0].angle == 0
    assert blocks[1].block_type == "table" and blocks[1].angle == 90
    assert blocks[0].bbox == (0.01, 0.02, 0.5, 0.08)


def test_swapped_corners_normalize():
    raw = ("<|box_start|>500 400 100 100<|box_end|>"
           "<|ref_start|>text<|ref_end|>")
    (b,) = parse_layout_output(raw)
    assert b.bbox == (0.1, 0.1, 0.5, 0.4)


def test_prepare_for_extract_skips_and_rotates():
    img = np.zeros((100, 200, 3), np.uint8)
    img[:, :100] = 255                          # left half white
    blocks = [
        ContentBlock("image", (0.0, 0.0, 0.5, 0.5)),       # skipped
        ContentBlock("table", (0.0, 0.0, 0.5, 1.0), angle=90),
        ContentBlock("text", (0.5, 0.0, 1.0, 1.0)),
        ContentBlock("equation", (0.0, 0.0, 1.0, 0.3)),
    ]
    crops, prompts, indices = prepare_for_extract(img, blocks)
    assert indices == [1, 2, 3]
    assert prompts == ["\nTable Recognition:", "\nText Recognition:",
                       "\nFormula Recognition:"]
    # the 90° block (100h x 100w) is rotated: still square here, but the
    # rotation is applied (clockwise, matching imageops::rotate90)
    tall = np.zeros((60, 30, 3), np.uint8)
    tall[0, :, 0] = 255                         # top row marked
    rot = prepare_for_extract(
        tall, [ContentBlock("text", (0.0, 0.0, 1.0, 1.0), angle=90)])[0][0]
    assert rot.shape[:2][0] >= 28               # resize floor applied
    assert prompt_for_block("code") == "\nText Recognition:"


def test_crop_rounding_half_away_from_zero():
    """f32::round is half-away-from-zero (mineru_layout.rs:159-167):
    0.5 * 101 = 50.5 must round to 51, not Python round()'s 50."""
    img = np.zeros((40, 101, 3), np.uint8)
    crops, _, _ = prepare_for_extract(
        img, [ContentBlock("text", (0.0, 0.0, 0.5, 1.0))],
        min_image_edge=1)
    # x2 = round(0.5*101) = 51 -> crop width 51 (min_edge=1: no resize)
    assert crops[0].shape[1] == 51


class _FakeFamily:
    class cfg:
        tasks = ("ocr",)

    def __init__(self, layout_raw):
        self.layout_raw = layout_raw
        self.calls = []

    def generate(self, images, task, *, max_new_tokens, prompt=None):
        self.calls.append((images[0].shape, prompt))
        if prompt == LAYOUT_PROMPT:
            return [self.layout_raw]
        return ["cell-a cell-b"]


def test_run_two_step():
    raw = ("<|box_start|>0 0 500 500<|box_end|>"
           "<|ref_start|>text<|ref_end|>\n"
           "<|box_start|>500 500 1000 1000<|box_end|>"
           "<|ref_start|>image<|ref_end|>")
    fam = _FakeFamily(raw)
    img = np.zeros((200, 200, 3), np.uint8)
    blocks = run_two_step(fam, img, max_new_tokens=8)
    assert len(blocks) == 2
    # layout pass ran on the 1036² square
    assert fam.calls[0][0][:2] == (LAYOUT_IMAGE_SIZE, LAYOUT_IMAGE_SIZE)
    assert fam.calls[0][1] == LAYOUT_PROMPT
    # text block recognized, image block left untouched
    assert blocks[0].content == "cell-a cell-b"
    assert blocks[1].content is None
    assert blocks[0].to_json()["type"] == "text"

"""PaddleOCR-VL example (oar-ocr-vl/examples/paddleocr_vl.rs): image +
task prompt -> text via the exact Ernie-based VLM."""

from _common import load_image, parse_args


def main():
    args = parse_args("PaddleOCR-VL example",
                      task=dict(default="ocr",
                                help="ocr|table|formula|chart"))
    from oar_ocr_tpu.vl.model import PaddleOCRVL
    from oar_ocr_tpu.vl.paddleocr_vl import PaddleOCRVLConfig

    img = load_image(args)
    # tiny config = random weights demo; converted checkpoints use the
    # default config + HFTokenizer (runtime/ppocr_maps.build_vl_map)
    vlm = PaddleOCRVL(cfg=PaddleOCRVLConfig().tiny())
    res = vlm.generate([img], args.task, max_new_tokens=32)[0]
    print(f"prompt tokens: {res.num_prompt_tokens}")
    print("text:", res.text[:200])


if __name__ == "__main__":
    main()

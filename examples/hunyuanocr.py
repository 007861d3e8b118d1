"""HunyuanOCR example (oar-ocr-vl/examples/hunyuanocr.rs): exact vision
tower + XDRoPE decoder; DFlash speculation via the family harness."""

from _common import load_image, parse_args


def main():
    args = parse_args("HunyuanOCR example",
                      instruction=dict(default="OCR:"))
    from oar_ocr_tpu.vl.hunyuan import HunyuanOCRConfig, HunyuanOCRModel

    img = load_image(args)
    model = HunyuanOCRModel(cfg=HunyuanOCRConfig().tiny())
    text = model.generate([img], args.instruction, max_new_tokens=32)[0]
    print("text:", text[:200])


if __name__ == "__main__":
    main()

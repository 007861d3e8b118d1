"""Seal (curved) text detection example (examples/seal_text_detection.rs):
the polygon det path + seal OCR preset."""

from _common import load_image, parse_args


def main():
    args = parse_args("Seal text detection example")
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder

    img = load_image(args)
    pipe = (OAROCRBuilder("seal")
            .with_det_config(box_thresh=0.05, thresh=0.45).build())
    result = pipe.predict([img])[0]
    print(f"{len(result.regions)} seal text regions")
    for r in result.regions:
        print(f"  {r.text!r} poly pts={len(r.box)}")


if __name__ == "__main__":
    main()

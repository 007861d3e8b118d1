"""Full OCR pipeline example (examples/ocr.rs analog): detect + recognize,
print regions, save the annotated canvas."""

from _common import load_image, out_path, parse_args


def main():
    args = parse_args("OAROCR end-to-end example",
                      preset=dict(default="general",
                                  help="general|seal|fast preset"))
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
    from oar_ocr_tpu.utils.visualization import draw_ocr_canvas, save_image

    img = load_image(args)
    pipe = (OAROCRBuilder(args.preset)
            .with_det_config(box_thresh=0.05, thresh=0.45)   # random-weight
            .build())
    result = pipe.predict([img])[0]
    print(f"{len(result.regions)} regions")
    for i, r in enumerate(result.regions):
        print(f"  {i}: {r.text!r} conf={r.confidence}")
    canvas = draw_ocr_canvas(img, [r.box for r in result.regions],
                             [r.text or "" for r in result.regions],
                             [r.det_score or 0 for r in result.regions])
    save_image(out_path(args, "ocr_annotated.png"), canvas)
    print("wrote", out_path(args, "ocr_annotated.png"))


if __name__ == "__main__":
    main()

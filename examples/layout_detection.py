"""Layout detection example (examples/layout_detection.rs analog)."""

from _common import load_image, out_path, parse_args


def main():
    args = parse_args("Layout detection example",
                      variant=dict(default="pp-doclayout-m",
                                   help="variant from domain/layout.py"))
    import jax.numpy as jnp
    from oar_ocr_tpu.models.detection.layout import LayoutDetector
    from oar_ocr_tpu.utils.visualization import draw_layout, save_image

    img = load_image(args)
    det = LayoutDetector(args.variant, score_thresh=0.05)
    pages = det.runtime.put(jnp.asarray(img)[None])
    boxes = det.detect(pages, [img.shape[:2]])[0]
    print(f"{len(boxes)} layout elements")
    for b in boxes[:10]:
        print(f"  {b.label}: score={b.score:.2f} box={b.box.round(1)}")
    save_image(out_path(args, "layout_annotated.png"),
               draw_layout(img, boxes))
    print("wrote", out_path(args, "layout_annotated.png"))


if __name__ == "__main__":
    main()

"""Table cell detection example (examples/table_cell_detection.rs):
RT-DETR-L cell detector over a table crop."""

from _common import load_image, out_path, parse_args


def main():
    args = parse_args("RT-DETR table cell detection example")
    import jax.numpy as jnp
    from oar_ocr_tpu.models.detection.layout import LayoutDetector
    from oar_ocr_tpu.utils.visualization import draw_layout, save_image

    img = load_image(args)
    det = LayoutDetector("rt-detr-l_wired_table_cell_det", score_thresh=0.05)
    pages = det.runtime.put(jnp.asarray(img)[None])
    cells = det.detect(pages, [img.shape[:2]])[0]
    print(f"{len(cells)} cells")
    save_image(out_path(args, "cells_annotated.png"),
               draw_layout(img, cells, show_order=False))
    print("wrote", out_path(args, "cells_annotated.png"))


if __name__ == "__main__":
    main()

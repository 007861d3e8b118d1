"""Text detection example (examples/text_detection.rs analog)."""

from _common import load_image, out_path, parse_args


def main():
    args = parse_args("DBNet text detection example")
    import jax.numpy as jnp
    from oar_ocr_tpu.models.detection.detector import DBDetector
    from oar_ocr_tpu.processors.db_postprocess import DBPostProcessConfig
    from oar_ocr_tpu.utils.visualization import (Detection, draw_detections,
                                                 save_image)

    img = load_image(args)
    det = DBDetector(post_cfg=DBPostProcessConfig(thresh=0.45,
                                                  box_thresh=0.05))
    pages = det.runtime.put(jnp.asarray(img)[None])
    boxes, scores = det.detect(pages, [img.shape[:2]])[0]
    print(f"{len(boxes)} boxes")
    vis = draw_detections(img, [Detection(b, s)
                                for b, s in zip(boxes, scores)])
    save_image(out_path(args, "det_annotated.png"), vis)
    print("wrote", out_path(args, "det_annotated.png"))


if __name__ == "__main__":
    main()

"""Text line orientation example (examples/text_line_orientation.rs):
0/180 per line."""

from _common import load_image, make_text_line, parse_args


def main():
    args = parse_args("Text line orientation example")
    import numpy as np
    import jax.numpy as jnp
    from oar_ocr_tpu.models.classification.pp_lcnet import (
        textline_orientation_classifier)

    img = load_image(args, maker=make_text_line)
    clf = textline_orientation_classifier()
    pages = clf.runtime.put(jnp.asarray(img)[None])
    h, w = img.shape[:2]
    quad = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float32)
    cls, score = clf.classify_quads(pages, [(0, quad)])[0]
    print(f"line rotation: {cls * 180} deg ({score:.3f})")


if __name__ == "__main__":
    main()

"""Text recognition example (examples/text_recognition.rs analog):
recognize one pre-cropped text line."""

import numpy as np

from _common import load_image, make_text_line, parse_args


def main():
    args = parse_args("SVTR text recognition example")
    import jax.numpy as jnp
    from oar_ocr_tpu.models.recognition.recognizer import (CropPlan,
                                                           CTCRecognizer)

    img = load_image(args, maker=make_text_line)
    rec = CTCRecognizer()
    h, w = img.shape[:2]
    quad = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float32)
    plan = CropPlan.from_quad(0, quad)
    pages = rec.runtime.put(jnp.asarray(img)[None])
    text, conf, _cols = rec.recognize_chunk(pages, [plan],
                                            host_images=[img])[0]
    print(f"text={text!r} confidence={conf:.3f}")


if __name__ == "__main__":
    main()

"""Document orientation example (examples/document_orientation.rs):
0/90/180/270 page rotation."""

from _common import load_image, parse_args


def main():
    args = parse_args("Document orientation example")
    import jax.numpy as jnp
    from oar_ocr_tpu.models.classification.pp_lcnet import (
        doc_orientation_classifier)

    img = load_image(args)
    clf = doc_orientation_classifier()
    pages = clf.runtime.put(jnp.asarray(img)[None])
    cls, score = clf.classify_pages(pages, [img.shape[:2]])[0]
    print(f"page rotation: {cls * 90} deg ({score:.3f})")


if __name__ == "__main__":
    main()

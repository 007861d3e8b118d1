"""Table classification example (examples/table_classification.rs):
wired vs wireless."""

from _common import load_image, parse_args


def main():
    args = parse_args("Table classification example")
    import jax.numpy as jnp
    from oar_ocr_tpu.models.classification.pp_lcnet import table_classifier

    img = load_image(args)
    clf = table_classifier()
    pages = clf.runtime.put(jnp.asarray(img)[None])
    cls, score = clf.classify_pages(pages, [img.shape[:2]])[0]
    print(f"table type: {'wired' if cls == 0 else 'wireless'} ({score:.3f})")


if __name__ == "__main__":
    main()

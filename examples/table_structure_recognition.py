"""Table structure example (examples/table_structure_recognition.rs):
SLANet structure tokens + cell boxes + HTML."""

from _common import load_image, out_path, parse_args


def main():
    args = parse_args("SLANet table structure example")
    import jax.numpy as jnp
    from oar_ocr_tpu.models.recognition.slanet import SLANetModel
    from oar_ocr_tpu.processors.table import wrap_table_html

    img = load_image(args)
    model = SLANetModel(max_steps=64)
    pages = model.runtime.put(jnp.asarray(img)[None])
    h, w = img.shape[:2]
    out = model.recognize(pages, [(0, (0, 0, w, h))])[0]
    print("structure tokens:", out.tokens[:20], "...")
    print(f"{len(out.cell_boxes)} cell boxes, score={out.score:.3f}")
    with open(out_path(args, "table.html"), "w") as f:
        f.write(wrap_table_html(out.tokens))
    print("wrote", out_path(args, "table.html"))


if __name__ == "__main__":
    main()

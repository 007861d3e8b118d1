"""Document structure example (examples/structure.rs analog): layout +
tables + reading order -> markdown/HTML/JSON + annotated page."""

from _common import load_image, out_path, parse_args


def main():
    args = parse_args("PP-StructureV3 example")
    from oar_ocr_tpu.pipelines.structure import OARStructureBuilder
    from oar_ocr_tpu.utils.visualization import draw_structure, save_image

    img = load_image(args)
    pipe = (OARStructureBuilder()
            .with_layout_variant("picodet-s_layout_3cls")   # small demo net
            .with_tables(False).build())
    result = pipe.predict([img])[0]
    print(f"{len(result.elements)} elements")
    import os

    os.makedirs(args.out, exist_ok=True)
    written = result.save_results(args.out, stem="page")
    save_image(out_path(args, "structure_annotated.png"),
               draw_structure(img, result))
    print("wrote", ", ".join(sorted(written)), "+ structure_annotated.png",
          "in", args.out)


if __name__ == "__main__":
    main()

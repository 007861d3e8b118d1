"""Document rectification example (examples/document_rectification.rs):
UVDoc unwarping."""

from _common import load_image, out_path, parse_args


def main():
    args = parse_args("UVDoc rectification example")
    from oar_ocr_tpu.models.rectification.uvdoc import UVDocRectifier
    from oar_ocr_tpu.utils.visualization import save_image

    img = load_image(args)
    rect = UVDocRectifier()
    out = rect.rectify(img)
    save_image(out_path(args, "rectified.png"), out)
    print("wrote", out_path(args, "rectified.png"), out.shape)


if __name__ == "__main__":
    main()

"""ovisocr2 example (oar-ocr-vl/examples/ovisocr2.rs analog): the exact
architecture's distinctive decode on its tiny config. The generic
families demo with mechanism selection lives in vl_families.py."""

from _common import load_image, parse_args


def main():
    args = parse_args("ovisocr2 example")
    img = load_image(args)
    from oar_ocr_tpu.vl.exact_models import ovis_exact

    out = ovis_exact(tiny=True).generate([img], max_new_tokens=24)
    print("hybrid GatedDeltaNet decode:", repr(out[0][:160]))


if __name__ == "__main__":
    main()

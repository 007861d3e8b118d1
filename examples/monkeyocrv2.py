"""monkeyocrv2 example (oar-ocr-vl/examples/monkeyocrv2.rs analog): the exact
architecture's distinctive decode on its tiny config. The generic
families demo with mechanism selection lives in vl_families.py."""

from _common import load_image, parse_args


def main():
    args = parse_args("monkeyocrv2 example")
    img = load_image(args)
    from oar_ocr_tpu.vl.exact_models import monkey_exact
    from oar_ocr_tpu.vl.families import monkey_end2end_to_structure

    out = monkey_exact(tiny=True).generate([img], max_new_tokens=24)
    print("end-to-end:", repr(out[0][:140]))
    parsed = monkey_end2end_to_structure(out[0], img.shape[1], img.shape[0])
    print("parsed elements:", len(parsed.elements))


if __name__ == "__main__":
    main()

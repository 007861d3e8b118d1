"""glmocr example (oar-ocr-vl/examples/glmocr.rs analog): the exact
architecture's distinctive decode on its tiny config. The generic
families demo with mechanism selection lives in vl_families.py."""

from _common import load_image, parse_args


def main():
    args = parse_args("glmocr example")
    img = load_image(args)
    from oar_ocr_tpu.vl.exact_models import glm_exact, glm_speculative_exact

    plain = glm_exact(tiny=True).generate([img], max_new_tokens=24)
    spec = glm_speculative_exact(tiny=True).generate_speculative(
        [img], max_new_tokens=24)
    print("greedy:", repr(plain[0][:120]))
    print("MTP speculative (greedy-exact):", repr(spec[0][:120]))
    assert plain == spec


if __name__ == "__main__":
    main()

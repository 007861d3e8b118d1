"""hpd_parsing example (oar-ocr-vl/examples/hpd_parsing.rs analog): the exact
architecture's distinctive decode on its tiny config. The generic
families demo with mechanism selection lives in vl_families.py."""

from _common import load_image, parse_args


def main():
    args = parse_args("hpd_parsing example")
    img = load_image(args)
    from oar_ocr_tpu.vl.exact_models import hpd_fork_exact

    m = hpd_fork_exact(tiny=True)
    out = m.parse_with_forks(img, max_new_tokens=16)
    print("parent:", repr(out["parent"][:120]))
    print("children:", len(out["children"]), "stats:", out["stats"])


if __name__ == "__main__":
    main()

"""mineru example (oar-ocr-vl/examples/mineru.rs analog): the exact
architecture's distinctive decode on its tiny config. The generic
families demo with mechanism selection lives in vl_families.py."""

from _common import load_image, parse_args


def main():
    args = parse_args("mineru example")
    img = load_image(args)
    from oar_ocr_tpu.vl.exact_models import mineru_exact
    from oar_ocr_tpu.vl.families import MinerU

    out = mineru_exact(tiny=True).generate([img], max_new_tokens=24)
    print("extraction:", repr(out[0][:160]))
    blocks = MinerU(tiny=True).parse_two_step(img, max_new_tokens=8)
    print(f"two-step blocks: {len(blocks)}"
          + (f" first={blocks[0].block_type}" if blocks else
             " (random weights emit no layout lines)"))


if __name__ == "__main__":
    main()

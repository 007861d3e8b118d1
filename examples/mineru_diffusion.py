"""mineru_diffusion example (oar-ocr-vl/examples/mineru_diffusion.rs analog): the exact
architecture's distinctive decode on its tiny config. The generic
families demo with mechanism selection lives in vl_families.py."""

from _common import load_image, parse_args


def main():
    args = parse_args("mineru_diffusion example")
    img = load_image(args)
    from oar_ocr_tpu.vl.exact_models import mineru_diffusion_exact

    m = mineru_diffusion_exact(tiny=True)
    out = m.generate([img], max_new_tokens=16, block_len=4,
                     num_unmask_steps=3)
    print("SDAR block-diffusion decode:", repr(out[0][:160]))


if __name__ == "__main__":
    main()

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

    # the reference example DEFAULTS to the MinerU-style two-step
    # structured extraction (mineru_diffusion.rs --single-pass inverts);
    # the diffusion family shares vl/mineru_layout.run_two_step
    from oar_ocr_tpu.vl.families import MinerUDiffusion
    from oar_ocr_tpu.vl.mineru_layout import run_two_step

    blocks = run_two_step(MinerUDiffusion(tiny=True), img,
                          max_new_tokens=8)
    print(f"two-step blocks: {len(blocks)}"
          if blocks else "two-step: no layout lines (random weights)")


if __name__ == "__main__":
    main()

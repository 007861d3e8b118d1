"""VLM family lineup in one script: each family's distinctive decode
mechanism on its tiny config (per-family analogs of the reference's
oar-ocr-vl example binaries live in glmocr.py, mineru.py,
mineru_diffusion.py, hpd_parsing.py, ovisocr2.py, monkeyocrv2.py)."""

from _common import load_image, parse_args


def main():
    args = parse_args("VLM families example",
                      family=dict(default="glmocr",
                                  help="glmocr|mineru|mineru_diffusion|"
                                       "hpd_parsing|ovisocr2|monkeyocrv2|"
                                       "hunyuanocr"))
    from oar_ocr_tpu.vl import families as fam

    classes = {
        "hunyuanocr": fam.HunyuanOCR, "glmocr": fam.GLMOCR,
        "mineru": fam.MinerU, "mineru_diffusion": fam.MinerUDiffusion,
        "hpd_parsing": fam.HPDParsing, "ovisocr2": fam.OvisOCR2,
        "monkeyocrv2": fam.MonkeyOCRv2,
    }
    img = load_image(args)
    family = classes[args.family](tiny=True)
    if hasattr(family, "generate_speculative") and family.cfg.draft_len:
        out = family.generate_speculative([img], max_new_tokens=24)
        mech = "speculative (draft+verify, greedy-exact)"
    else:
        out = family.generate([img], max_new_tokens=24)
        mech = "greedy scan"
    print(f"{args.family} [{mech}]:", repr(out[0][:160]))


if __name__ == "__main__":
    main()

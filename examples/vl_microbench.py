"""VL micro-benchmark (oar-ocr-vl/examples/metal_bench.rs analog):
steady-state prefill + per-token decode timing for one family on the
current backend. Random weights — timings reflect the compute graphs,
not real model quality."""

import time

from _common import load_image, parse_args


def main():
    args = parse_args("VL micro-benchmark",
                      family=dict(default="hunyuanocr",
                                  help="hunyuanocr|glmocr|mineru|"
                                       "ovisocr2|monkeyocrv2"),
                      tokens=dict(default="32", help="decode length"))
    from oar_ocr_tpu.vl import families as fam

    classes = {"hunyuanocr": fam.HunyuanOCR, "glmocr": fam.GLMOCR,
               "mineru": fam.MinerU, "ovisocr2": fam.OvisOCR2,
               "monkeyocrv2": fam.MonkeyOCRv2}
    img = load_image(args)
    n = int(args.tokens)
    family = classes[args.family](tiny=True)
    family.generate([img], max_new_tokens=n)      # compile
    t0 = time.perf_counter()
    family.generate([img], max_new_tokens=n)
    dt = time.perf_counter() - t0
    print(f"{args.family}: {dt * 1e3:.1f} ms for prefill+{n} tokens "
          f"({dt / n * 1e3:.2f} ms/token upper bound)")


if __name__ == "__main__":
    main()

"""VL micro-benchmark (oar-ocr-vl/examples/metal_bench.rs analog):
steady-state prefill + per-token decode timing for one family on the
current backend. Random weights — timings reflect the compute graphs,
not real model quality."""

import time

from _common import load_image, parse_args


def bench_gated_delta(t: int = 2048, runs: int = 3):
    """Chunked vs sequential gated-delta prefill at Ovis-like shapes —
    the SURVEY §7 'associative-scan formulation' win, measured."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from oar_ocr_tpu.vl.gated_delta import (gated_delta_rule,
                                            gated_delta_rule_chunked)

    b, h, dk, dv = 1, 16, 128, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, t, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, dv)), jnp.float32)
    a = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((b, h, t))))
    be = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((b, h, t))))

    for name, fn in (("sequential-scan", jax.jit(gated_delta_rule)),
                     ("chunked", jax.jit(gated_delta_rule_chunked))):
        fn(q, k, v, a, be).block_until_ready()          # compile
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            float(jnp.sum(fn(q, k, v, a, be)))          # force fetch
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"gated-delta {name:16s} T={t}: {best * 1e3:8.1f} ms")


def bench_spec_delta(n: int = 48):
    """Greedy vs n-gram-speculative decode on the hybrid delta stack
    (ExactVLM.generate_speculative — the combination the reference
    avoids; output is greedy-exact, only latency differs)."""
    import numpy as np

    from oar_ocr_tpu.vl.exact_models import ovis_exact

    img = np.random.default_rng(0).integers(0, 255, (24, 40, 3),
                                            dtype=np.uint8)
    m = ovis_exact(tiny=True)
    m.generate([img], max_new_tokens=n)                  # compile
    m.generate_speculative([img], max_new_tokens=n)      # compile
    t0 = time.perf_counter()
    m.generate([img], max_new_tokens=n)
    tg = time.perf_counter() - t0
    t0 = time.perf_counter()
    m.generate_speculative([img], max_new_tokens=n)
    ts = time.perf_counter() - t0
    print(f"ovis hybrid greedy: {tg * 1e3:8.1f} ms for {n} tokens")
    print(f"ovis hybrid n-gram-spec: {ts * 1e3:8.1f} ms (greedy-exact)")


def main():
    args = parse_args("VL micro-benchmark",
                      family=dict(default="hunyuanocr",
                                  help="hunyuanocr|glmocr|mineru|"
                                       "ovisocr2|monkeyocrv2|gated-delta|"
                                       "spec-delta"),
                      tokens=dict(default="32", help="decode length"))
    from oar_ocr_tpu.vl import families as fam

    if args.family == "gated-delta":
        bench_gated_delta()
        return
    if args.family == "spec-delta":
        bench_spec_delta()
        return

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

"""VL perf artifact emitter (VERDICT r4 item 5 — the measured decode
story the reference ships as oar-ocr-vl/examples/metal_bench.rs).

Emits ONE JSON document (stdout; ``--out`` writes it to a file, e.g.
VLBENCH_r05.json):

- **paddleocr-vl** (flagship, FULL config dims — Ernie-0.3B decoder +
  SigLIP-27L tower — fast-init random weights): prefill ms (vision
  encode + prompt prefill + first token) and steady decode tokens/s per
  pow2 KV-cache bucket. Timings are shape-bound: random weights compile
  and execute the identical programs real checkpoints do.
- **glm-mtp** (GLM-OCR 40-layer decoder + its trained-MTP-head
  speculative mechanism, fast-init): decode tokens/s speculative vs
  greedy, with acceptance accounting (rounds / drafted / accepted).
  NOTE: with random weights the MTP head's proposals are noise, so the
  measured acceptance is the mechanism's FLOOR — the per-round cost
  model (draft k + one verify pass) is what this measures; real-weight
  acceptance only raises tokens/s.
- **ngram-spec** (the training-free n-gram prompt-lookup drafter on the
  same GLM stack, batch-1): acceptance on a repetitive decode — random
  decoders loop, which is exactly the regime prompt-lookup exploits, so
  this shows the speculative machinery winning end to end.

Method: per (bucket, max_new) the first call compiles (excluded), then
best-of-N wall times. decode ms/token = (t_long − t_short) /
(new_long − new_short) at the SAME pinned KV bucket (min_capacity);
prefill ms = t_short − new_short · decode. Session caveats (tunnel RTT,
bandwidth EMAs) are recorded in the JSON — absolute numbers are
comparable within a session only (docs/environment-variables.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEW_SHORT, NEW_LONG = 32, 128
RUNS = 3


def _page(side: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.full((side, side, 3), 255, np.uint8)
    for r in range(side // 64):
        img[20 + 56 * r : 44 + 56 * r, 16 : side - 16] = rng.integers(0, 60)
    return img


def _best(fn, runs: int = RUNS) -> float:
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def bench_paddle(buckets, tiny: bool = False) -> dict:
    from oar_ocr_tpu.vl.model import PaddleOCRVL

    print(f"[vl_bench] building PaddleOCR-VL "
          f"({'tiny' if tiny else 'full'} dims, fast init)…",
          file=sys.stderr)
    if tiny:
        from oar_ocr_tpu.vl.paddleocr_vl import PaddleOCRVLConfig

        vlm = PaddleOCRVL(cfg=PaddleOCRVLConfig().tiny(), fast_init=True)
    else:
        vlm = PaddleOCRVL(fast_init=True)
    per_bucket = {}
    for cap in buckets:
        # image sized so prompt + NEW_LONG fits the pinned bucket
        side = (56 if tiny
                else 224 if cap <= 512 else 448 if cap <= 1024 else 896)
        img = _page(side)
        res = {}
        for max_new in (NEW_SHORT, NEW_LONG):
            print(f"[vl_bench] paddle cap={cap} max_new={max_new} "
                  f"(first call compiles)…", file=sys.stderr)
            g = vlm.generate([img], "ocr", max_new_tokens=max_new,
                             raw=True, min_capacity=cap)       # compile
            n_prompt = g[0].num_prompt_tokens
            res[max_new] = _best(lambda mn=max_new: vlm.generate(
                [img], "ocr", max_new_tokens=mn, raw=True,
                min_capacity=cap))
            print(f"[vl_bench]   {res[max_new]*1e3:.0f} ms "
                  f"(prompt {n_prompt})", file=sys.stderr)
        dec_s = (res[NEW_LONG] - res[NEW_SHORT]) / (NEW_LONG - NEW_SHORT)
        per_bucket[str(cap)] = {
            "image_side": side,
            "prompt_tokens": n_prompt,
            "prefill_ms": round((res[NEW_SHORT] - NEW_SHORT * dec_s) * 1e3,
                                1),
            "decode_ms_per_token": round(dec_s * 1e3, 2),
            "decode_tokens_per_sec": round(1.0 / dec_s, 1) if dec_s > 0
            else None,
            "wall_ms": {str(k): round(v * 1e3) for k, v in res.items()},
        }
    return {"model": "paddleocr-vl (Ernie-0.3B + SigLIP-27L, random "
                     "fast-init weights — shape-bound timings)",
            "per_kv_bucket": per_bucket}


def bench_glm_spec(max_new: int = 128, tiny: bool = False) -> dict:
    from oar_ocr_tpu.vl.exact_models import glm_speculative_exact

    print(f"[vl_bench] building GLM-OCR + MTP "
          f"({'tiny' if tiny else 'full'} dims, fast init)…",
          file=sys.stderr)
    glm = glm_speculative_exact(tiny=tiny, fast_init=True, draft_k=4)
    img = _page(56 if tiny else 224, seed=1)

    # OCR decodes are LOW-entropy (small effective charset, looping
    # structure); an unrestricted random decoder over a ~100k vocab is
    # the unrealistically-HIGH-entropy case and starves prompt-lookup
    # of any repetition. Confine the random lm_head's argmax to tokens
    # [8, 56): every other column copies column 8, so ties resolve to
    # token 0 — never eos_id (2) — and the decode always runs the full
    # max_new (greedy/speculative walls stay comparable). Same realism
    # trick as bench.py's blank-biased CTC head; timings unchanged
    # (identical shapes/programs).
    k = glm.params["params"]["lm_head"]["kernel"]
    ref = k[:, 8:9]
    k = k.at[:, :8].set(ref)
    glm.params["params"]["lm_head"]["kernel"] = k.at[:, 56:].set(ref)

    # greedy baseline (one scan program)
    print("[vl_bench] glm greedy (compiles)…", file=sys.stderr)
    glm.generate([img], max_new_tokens=max_new)
    t_greedy = _best(lambda: glm.generate([img], max_new_tokens=max_new),
                     runs=2)

    # trained-MTP mechanism (random weights → floor acceptance)
    print("[vl_bench] glm mtp-speculative (compiles)…", file=sys.stderr)
    glm.generate_speculative([img], max_new_tokens=max_new)
    stats: dict = {}

    def run_mtp():
        stats.clear()                 # per-run stats, not best-of sums
        return glm.generate_speculative([img], max_new_tokens=max_new,
                                        stats=stats)

    t_mtp = _best(run_mtp, runs=2)

    # training-free n-gram prompt-lookup drafts on the same stack —
    # low-entropy decodes loop, the regime prompt-lookup exploits
    from oar_ocr_tpu.vl.exact_models import ExactVLM

    print("[vl_bench] glm ngram-speculative (compiles)…", file=sys.stderr)
    ExactVLM.generate_speculative(glm, [img], max_new_tokens=max_new)
    nstats: dict = {}

    def run_ng():
        nstats.clear()
        return ExactVLM.generate_speculative(
            glm, [img], max_new_tokens=max_new, stats=nstats)

    t_ng = _best(run_ng, runs=2)

    def acc(s):
        return {**s, "acceptance_rate": round(
            s.get("accepted", 0) / max(s.get("drafted", 1), 1), 3),
            "tokens_per_round": round(
                s.get("emitted", 0) / max(s.get("rounds", 1), 1), 2)}

    return {
        "model": "glm-ocr (40L decoder, random fast-init weights)",
        "max_new_tokens": max_new,
        "greedy": {"wall_ms": round(t_greedy * 1e3),
                   "tokens_per_sec": round(max_new / t_greedy, 1)},
        "mtp_speculative": {"wall_ms": round(t_mtp * 1e3),
                            "tokens_per_sec": round(max_new / t_mtp, 1),
                            **acc(stats),
                            "note": "random MTP head → floor acceptance; "
                                    "measures the round cost model"},
        "ngram_speculative": {"wall_ms": round(t_ng * 1e3),
                              "tokens_per_sec": round(max_new / t_ng, 1),
                              **acc(nstats)},
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="512,1024",
                    help="pow2 KV buckets for the paddleocr-vl sweep")
    ap.add_argument("--skip-glm", action="store_true")
    ap.add_argument("--skip-paddle", action="store_true")
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config dims (CI smoke; artifact runs full)")
    ap.add_argument("--out", help="also write the JSON here")
    args = ap.parse_args(argv)

    import jax

    out = {
        "metric": "vl_decode",
        "platform": jax.devices()[0].platform,
        "caveats": "single chip through the axon tunnel; timings "
                   "comparable within a session only (ambient bandwidth "
                   "swings 4x across days); weights random fast-init — "
                   "shape-bound perf, not model quality",
    }
    if not args.skip_paddle:
        buckets = [int(b) for b in args.buckets.split(",")]
        out["paddleocr_vl"] = bench_paddle(buckets, tiny=args.tiny)
    if not args.skip_glm:
        out["glm_speculative"] = bench_glm_spec(args.max_new,
                                                tiny=args.tiny)

    from oar_ocr_tpu.runtime.runtime import Runtime

    rt = Runtime.default()
    out["link"] = {"h2d_mbps_ema": rt.h2d_mbps and round(rt.h2d_mbps),
                   "d2h_mbps_ema": rt.d2h_mbps and round(rt.d2h_mbps),
                   "d2h_rtt_ms_ema": rt._d2h_rtt and round(
                       rt._d2h_rtt * 1e3, 1)}
    doc = json.dumps(out)
    print(doc)
    if args.out:
        with open(args.out, "w") as f:
            f.write(doc + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""End-to-end det+rec throughput benchmark (driver contract).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The headline ``value`` is the PIPELINED steady-state throughput — the
bench runs iterations two-deep (iteration N+1's upload + det dispatch
issued before iteration N's rec/collect, the serving engine's proven
double-buffering — serving/engine.py, test_serving.py:200) because
steady-state pages/s is the unit the BASELINE target is denominated in.
The sequential per-call latency story is kept alongside (``p50``,
``p50_ms``, per-stage breakdown) — VERDICT r4 item 1.

Workload: the REAL `OAROCR.predict` path — page upload, fused
preprocess+DBNet+host postprocess detection, pooled ratio-sorted
recognition on the DETECTOR'S OWN boxes, and result assembly, all inside
the timer (VERDICT r2 item 2: no fixture quads, no pre-uploaded pages).
THREE content classes are measured (VERDICT r4 item 2 — the adaptive
sparse upload is content-dependent):

- ``flat``: white pages with uniform dark text blocks (near-best case
  for the constant-tile sparse upload; the headline workload);
- ``dense_content``: per-pixel RGB noise background + the same text
  blocks (incompressible — the sparse upload falls back to the full
  dense transfer; the honest degraded-link worst case);
- ``scanned_gray``: true-grayscale pages with per-pixel paper noise
  (the realistic document-scan middle: tile sparsity loses but the
  gray collapse ships 1/3 of the bytes).

Accuracy (VERDICT r4 item 3): after the timed phases a scrubbed-CPU
subprocess (tools/bench_accuracy.py) runs `OAROCR.predict` on bench
pages against the independent reference-semantics oracle
(tests/test_pipeline_golden.py machinery) and the resulting
``box_iou``/``text_match`` land in the JSON; a mismatch fails the bench
loudly.

Flake accounting (VERDICT r4 item 6): per-iteration wall times, dropped
iterations with their error messages, link-thread retry counts, and the
adaptive paths' degradation/scheduled-recovery counters are all emitted,
so an anomalous iteration is diagnosable from the artifact alone.

Weights: the detector runs assets/bench_det.safetensors — the exact
PP-OCRv5-mobile DB topology fitted to the synthetic text-block task
(tools/train_bench_det.py), so detection yields realistic candidate
counts (~17-20 regions/page at real scores). Recognition weights are
random with the CTC head biased toward blank (compute is shape-bound;
the bias makes the argmax statistics — and therefore the kept-only d2h
traffic — match trained recognizers); the decoded text is meaningless
but deterministic (the accuracy oracle reproduces it exactly).

Baseline: the reference's only published end-to-end number — PP-OCRv6
tiny 34 ms/img ≈ 29.4 pages/s single-stream CPU (docs/FAQ.md:22;
BASELINE.md).
"""

import json
import pathlib
import statistics
import sys
import time

import numpy as np

N_PAGES = 16
PAGE_H, PAGE_W = 1280, 960
REGIONS_PER_PAGE = 20
N_ITERS = 7          # sequential latency phase
PIPE_ITERS = 8       # pipelined steady-state phase
DENSE_ITERS = 4      # dense-content workload phase
BASELINE_PAGES_PER_SEC = 29.4
# v5e bf16 peak (public spec: 197 TFLOP/s bf16 per chip)
PEAK_TFLOPS = 197.0

# Varied line widths/heights exercise several rec width buckets, like a
# real page mixes titles, body lines and short labels.
_REGION_DIMS = [(700, 28), (420, 26), (180, 24), (760, 34), (260, 22)]

# Per-stage grouping of utils/tracing METRICS keys (the names the
# pipeline's stage_timer calls emit) → breakdown rows. MAIN-thread rows
# sum to ≈ wall time; LINK rows run on the runtime's link thread and
# OVERLAP the main-thread rows (link totals exceeding the matching
# *_wait rows is the overlap working, not double counting).
_STAGE_GROUPS = {
    "upload": ("ocr.upload",),
    "det_dispatch": ("det.dispatch",),
    "det_wait": ("det.wait",),
    "det_host": ("det.candidates", "det.finalize",
                 "det.postprocess_host", "det.poly_scores"),
    "scores_wait": ("det.scores_wait",),
    "rec_dispatch": ("rec.dispatch", "rec.dispatch_sep", "rec.host_warp"),
    "rec_wait": ("rec.wait",),
    "ctc_decode": ("rec.decode",),
}
_LINK_GROUPS = {
    "det_fetch": ("det.device",),
    "scores_fetch": ("det.scores",),
    "rec_fetch": ("rec.device",),
}


def _make_pages(rng, dense_background: bool = False,
                scanned_gray: bool = False):
    """Bench pages: 20 dark text blocks on white. ``dense_background``
    swaps the flat white for per-pixel RGB noise — zero constant
    32×32 tiles, so the sparse page upload cannot win and the full
    dense batch crosses the link (the content class the flat pages
    flatter). ``scanned_gray`` is the realistic middle class: true
    grayscale (R==G==B — what flatbed/phone scans of documents are
    after most scan software's gray conversion) with per-pixel paper
    noise — tile sparsity loses, but the gray collapse ships 1/3 of
    the bytes."""
    pages = []
    for _ in range(N_PAGES):
        if dense_background:
            img = rng.integers(215, 256, (PAGE_H, PAGE_W, 3),
                               dtype=np.uint8)
        elif scanned_gray:
            g = rng.integers(225, 256, (PAGE_H, PAGE_W, 1),
                             dtype=np.uint8)
            img = np.repeat(g, 3, axis=2)
        else:
            img = np.full((PAGE_H, PAGE_W, 3), 255, np.uint8)
        for r in range(REGIONS_PER_PAGE):
            w, h = _REGION_DIMS[r % len(_REGION_DIMS)]
            y = 40 + r * 60
            img[y : y + h, 60 : 60 + w] = rng.integers(0, 80)
        pages.append(img)
    return pages


def _load_det_params():
    import jax

    from oar_ocr_tpu.runtime.weights import load_params

    path = pathlib.Path(__file__).parent / "assets" / "bench_det.safetensors"
    tree = load_params(str(path))
    # host-side dtype cast: eager per-leaf device casts would compile one
    # tiny remote program per distinct shape on a cold cache
    return jax.tree.map(lambda a: np.asarray(a, np.float32), tree)


def _blank_biased_rec_params():
    """Random rec weights with the CTC head biased toward blank so the
    OUTPUT distribution matches trained recognizers (CTC is peaky: most
    timesteps argmax to blank, kept chars are a small fraction — the
    distribution the kept-only rec transfer is designed around). The
    compute is identical (same shapes, same FLOPs); only the argmax
    statistics change, which otherwise MIS-represent the d2h traffic a
    real deployment ships."""
    from oar_ocr_tpu.models.recognition.svtr import SVTRRecognizer
    from oar_ocr_tpu.ops.ctc import default_charset
    from oar_ocr_tpu.runtime.runtime import init_params

    vocab = 2 + len(default_charset())  # blank + charset + space
    params = init_params(SVTRRecognizer(vocab_size=vocab), (1, 48, 64, 3))
    params = {k: dict(v) if isinstance(v, dict) else v
              for k, v in params.items()}
    import jax

    def bias_blank(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        if names[-2:] == ["fc", "bias"]:
            leaf = np.asarray(leaf, np.float32).copy()
            leaf[0] += 4.0          # blank wins ~85-95% of timesteps
            return leaf
        return np.asarray(leaf, np.float32)

    return jax.tree_util.tree_map_with_path(bias_blank, params)


def _device_flops(n_regions: int) -> float:
    """Analytic per-iteration device-FLOP estimate.

    Det: profiler-measured 80 GFLOPs per 8-page 1280×960 batch
    (docs/ROADMAP.md perf notes — DBNet-mobile fused preprocess+conv
    program). Rec: the CRNN/SVTR mobile program at 48-px height is
    ~0.6 GFLOPs per crop at the mean bench widths. Both scale linearly
    in batch; good to ~±20%, labeled an estimate in the JSON.
    """
    det = 80e9 * (N_PAGES / 8)
    rec = 0.6e9 * n_regions
    return det + rec


def _breakdown(summary, groups) -> dict:
    out = {}
    accounted = 0.0
    for row, keys in groups.items():
        tot = sum(summary[k][1] for k in keys if k in summary)
        out[row] = round(tot * 1e3, 1)
        accounted += tot
    out["_accounted_ms"] = round(accounted * 1e3, 1)
    return out


class _Traffic:
    """Per-phase link-traffic snapshot with dropped-iteration exclusion
    (ADVICE r4: bytes a flaked, dropped iteration moved must not inflate
    the per-iter averages the floor model divides down)."""

    def __init__(self, rt):
        self.rt = rt
        self.d2h_b = rt.d2h_bytes_total
        self.d2h_n = rt.d2h_fetch_count
        self.h2d_b = rt.h2d_bytes_total
        self.ex_d2h_b = self.ex_d2h_n = self.ex_h2d_b = 0
        self._frozen = None

    def freeze(self):
        """Pin totals() at phase end so later phases' traffic can't leak
        into this phase's floor model (the r5 seq_link_floor was ~2×
        inflated by the pipelined phase's bytes before this)."""
        self._frozen = self.totals()

    def snapshot(self):
        rt = self.rt
        return (rt.d2h_bytes_total, rt.d2h_fetch_count, rt.h2d_bytes_total)

    def exclude_since(self, snap):
        rt = self.rt
        self.ex_d2h_b += rt.d2h_bytes_total - snap[0]
        self.ex_d2h_n += rt.d2h_fetch_count - snap[1]
        self.ex_h2d_b += rt.h2d_bytes_total - snap[2]

    def totals(self):
        if self._frozen is not None:
            return self._frozen
        rt = self.rt
        return (rt.d2h_bytes_total - self.d2h_b - self.ex_d2h_b,
                rt.d2h_fetch_count - self.d2h_n - self.ex_d2h_n,
                rt.h2d_bytes_total - self.h2d_b - self.ex_h2d_b)


def _link_floor_ms(rt, n_iters: int, traffic: _Traffic) -> dict:
    """Lower-bound per-iteration link cost from MEASURED traffic and the
    runtime's bandwidth/RTT EMAs: every byte must cross the tunnel and
    every d2h fetch pays the fixed RTT. The tunnel is full-duplex
    (uploads ride concurrently with fetches — measured: wall < h2d+d2h
    on degraded links), so in the CROSS-ITERATION overlap regime (the
    pipelined phase: iteration N+1's upload rides while iteration N
    collects) the floor is max(h2d, d2h + RTTs) per iteration. The
    SEQUENTIAL phase has a serialization point — the last rec fetch of
    iteration N completes before iteration N+1's upload starts — so its
    per-iteration wall can exceed this floor even when the overlap
    machinery is perfect. EMAs are coarse (the h2d figure is a lower
    BOUND from the free-observation window), so treat this as a
    story-teller, not a precision meter."""
    d2h_bytes, d2h_fetches, h2d_bytes = traffic.totals()
    rtt = rt._d2h_rtt or 0.0
    h2d = (h2d_bytes / n_iters) / (rt.h2d_mbps * 1e6) if rt.h2d_mbps else 0.0
    d2h = (d2h_bytes / n_iters) / (rt.d2h_mbps * 1e6) if rt.d2h_mbps else 0.0
    rtts = (d2h_fetches / n_iters) * rtt
    return {
        "h2d_ms": round(h2d * 1e3, 1),
        "d2h_ms": round(d2h * 1e3, 1),
        "rtt_ms": round(rtts * 1e3, 1),
        "total_ms": round(max(h2d, d2h + rtts) * 1e3, 1),
        "d2h_fetches_per_iter": round(d2h_fetches / n_iters, 1),
        "h2d_mb_per_iter": round(h2d_bytes / n_iters / 1e6, 2),
        "d2h_mb_per_iter": round(d2h_bytes / n_iters / 1e6, 2),
    }


def _warmup(pipe, pages_np, label: str):
    """Triple warmup with bounded flake retry: predict 1 seeds the
    link-bandwidth EMAs from nothing, so the ADAPTIVE paths (tile-sparse
    det fetch, sparse page upload) only engage — and compile — on
    predict 2, and the one-RTT SPECULATIVE det fetch needs the occupancy
    history predict 2's mask-first pass seeds, so its gather program
    first compiles on predict 3. The remote-compile tunnel occasionally
    drops a response mid-body; succeeded compiles are cached, so a
    straight retry resumes where the flake hit."""
    for attempt in range(3):
        try:
            res = pipe.predict(pages_np)
            pipe.predict(pages_np)
            pipe.predict(pages_np)
            return res
        except Exception as e:
            if attempt == 2:
                raise
            print(f"[{label}] warmup attempt {attempt + 1} failed ({e}); "
                  f"retrying", file=sys.stderr)


def _sequential_phase(pipe, pages_np, metrics):
    """N_ITERS strictly sequential `predict` calls: the per-call LATENCY
    story (p50 keeps its r3/r4 meaning). Dropped iterations are counted
    and their traffic excluded from the floor model."""
    rt = pipe.runtime
    traffic = _Traffic(rt)
    times, summaries, flake_msgs = [], [], []
    while len(times) < N_ITERS:
        metrics.reset()
        snap = traffic.snapshot()
        t0 = time.perf_counter()
        try:
            pipe.predict(pages_np)
        except Exception as e:
            # a tunnel flake mid-iteration must not zero the whole
            # bench; drop the iteration (excluding its traffic) and
            # retry (bounded)
            flake_msgs.append(str(e)[:200])
            if len(flake_msgs) > 2:
                raise
            traffic.exclude_since(snap)
            print(f"iter failed ({e}); retrying", file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        times.append(dt)
        summaries.append(metrics.summary())
        print(f"iter: {N_PAGES / dt:.2f} pages/s ({dt*1e3:.0f} ms)",
              file=sys.stderr)
    traffic.freeze()
    return times, summaries, flake_msgs, traffic


def _pipelined_phase(pipe, pages_np, n_iters: int, label: str = "pipelined"):
    """Two-deep steady state: iteration N+1's upload + det dispatch is
    issued BEFORE iteration N's collect (`predict_dispatch` /
    `predict_collect` — the split the serving engine double-buffers
    with, engine.py:248). Returns (total_s, per-iter collect-to-collect
    times, flake count)."""
    rt = pipe.runtime
    traffic = _Traffic(rt)
    flakes = 0
    while True:
        try:
            t0 = time.perf_counter()
            state = pipe.predict_dispatch(pages_np)
            times = []
            t_prev = t0
            for i in range(n_iters):
                nxt = (pipe.predict_dispatch(pages_np)
                       if i + 1 < n_iters else None)
                pipe.predict_collect(state)
                state = nxt
                t_now = time.perf_counter()
                times.append(t_now - t_prev)
                t_prev = t_now
            total = time.perf_counter() - t0
            break
        except Exception as e:
            flakes += 1
            if flakes > 2:
                raise
            print(f"[{label}] phase failed ({e}); restarting",
                  file=sys.stderr)
            traffic = _Traffic(rt)
    print(f"[{label}] {n_iters} iters in {total*1e3:.0f} ms = "
          f"{n_iters * N_PAGES / total:.2f} pages/s", file=sys.stderr)
    traffic.freeze()
    return total, times, flakes, traffic


def _accuracy_subprocess() -> dict:
    """Run tools/bench_accuracy.py in a scrubbed CPU subprocess (the
    axon sitecustomize force-registers the TPU backend at interpreter
    start, and bf16-vs-f32 forward numerics must match between the
    pipeline and the oracle — see the tool's docstring). Parses its one
    JSON line; a failure FAILS THE BENCH (non-zero exit)."""
    import os
    import subprocess

    repo = str(pathlib.Path(__file__).resolve().parent)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # gates axon registration
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(pathlib.Path(repo) / "tools"
                             / "bench_accuracy.py")],
        capture_output=True, text=True, cwd=repo, env=env, timeout=1800)
    if proc.returncode != 0:
        print(proc.stdout, file=sys.stderr)
        print(proc.stderr, file=sys.stderr)
        raise RuntimeError(
            f"bench accuracy check FAILED (exit {proc.returncode}) — "
            "pipeline output diverged from the reference-semantics oracle")
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def _anomalies(times, p50: float):
    """Iterations >1.5× the phase median, itemized so the artifact says
    which iteration dipped (r4's unexplained 624 ms iter)."""
    return [{"iter": i, "ms": round(t * 1e3),
             "over_p50": round(t / p50, 2)}
            for i, t in enumerate(times) if t > 1.5 * p50]


def main():
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
    from oar_ocr_tpu.utils.tracing import METRICS

    rng = np.random.default_rng(0)
    # two det batches of 8: batch 0's host candidate pass overlaps batch
    # 1's bitmap fetch (each fetch pays ~40 ms tunnel RTT); each batch's
    # rec sub-batches merge into one d2h transfer (pipelines/ocr.py).
    pipe = (OAROCRBuilder("general")
            .with_det_params(_load_det_params())
            .with_rec_params(_blank_biased_rec_params())
            .with_batch_sizes(image=8, region=64).build())
    rt = pipe.runtime
    pages_np = _make_pages(rng)

    res = _warmup(pipe, pages_np, "flat")
    n_regions = sum(len(r.regions) for r in res)
    print(f"warmup: {n_regions} regions over {N_PAGES} pages",
          file=sys.stderr)

    # --- phase 1: sequential latency (p50 keeps its meaning) ---
    times, summaries, flake_msgs, seq_traffic = _sequential_phase(
        pipe, pages_np, METRICS)
    best = min(times)
    p50 = statistics.median(times)
    med_summary = summaries[times.index(sorted(times)[len(times) // 2])]

    # --- phase 2: pipelined steady state (the headline) ---
    pipe_total, pipe_times, pipe_flakes, pipe_traffic = _pipelined_phase(
        pipe, pages_np, PIPE_ITERS)
    pipe_pps = PIPE_ITERS * N_PAGES / pipe_total
    pipe_p50 = statistics.median(pipe_times)

    # floor model from the PIPELINED phase's measured traffic (the
    # overlap regime the floor actually bounds); EMAs snapshot here,
    # before the dense phase moves them
    floor = _link_floor_ms(rt, PIPE_ITERS, pipe_traffic)
    h2d_ema, d2h_ema, rtt_ema = rt.h2d_mbps, rt.d2h_mbps, rt._d2h_rtt
    seq_floor = _link_floor_ms(rt, N_ITERS, seq_traffic)

    # --- phase 3: content-class workloads (VERDICT r4 item 2) ---
    # dense: incompressible RGB noise — the sparse upload falls back to
    # the full dense transfer (the degraded-link worst case);
    # scanned_gray: realistic document scans — true grayscale with
    # paper noise, the gray collapse ships 1/3 of the bytes.
    def _content_phase(pages, n_iters, label):
        try:
            for attempt in range(2):    # new shapes can flake a compile
                try:
                    res = pipe.predict(pages)           # warmup + policy
                    break
                except Exception as e:
                    if attempt == 1:
                        raise
                    print(f"[{label}] warmup failed ({e}); retrying",
                          file=sys.stderr)
            regions = sum(len(r.regions) for r in res)
            total, times, flakes, traffic = _pipelined_phase(
                pipe, pages, n_iters, label=label)
            w_floor = _link_floor_ms(rt, n_iters, traffic)
            return {
                "pages_per_sec": round(n_iters * N_PAGES / total, 2),
                "p50_ms": round(statistics.median(times) * 1e3),
                "iter_ms": [round(t * 1e3) for t in times],
                "regions": regions,
                "h2d_mb_per_iter": w_floor["h2d_mb_per_iter"],
                "d2h_mb_per_iter": w_floor["d2h_mb_per_iter"],
                "flakes": flakes,
            }
        except Exception as e:
            # a content workload must not zero the headline artifact;
            # emit the failure itself so the gap is visible, not silent
            print(f"[{label}] phase failed: {e}", file=sys.stderr)
            return {"error": str(e)[:300]}

    dense = _content_phase(
        _make_pages(np.random.default_rng(1), dense_background=True),
        DENSE_ITERS, "dense")
    scanned = _content_phase(
        _make_pages(np.random.default_rng(2), scanned_gray=True),
        DENSE_ITERS, "scanned_gray")

    # --- phase 4: accuracy bit (VERDICT r4 item 3) ---
    accuracy = _accuracy_subprocess()

    flops = _device_flops(n_regions)
    print(json.dumps({
        "metric": "pages_per_sec_det_rec",
        "value": round(pipe_pps, 2),
        "unit": "pages/s",
        "vs_baseline": round(pipe_pps / BASELINE_PAGES_PER_SEC, 3),
        # headline = pipelined steady state; sequential latency kept
        "pipelined": {
            "pages_per_sec": round(pipe_pps, 2),
            "iters": PIPE_ITERS,
            "total_ms": round(pipe_total * 1e3),
            "p50_iter_ms": round(pipe_p50 * 1e3),
            "iter_ms": [round(t * 1e3) for t in pipe_times],
            "anomalies": _anomalies(pipe_times, pipe_p50),
            "flakes": pipe_flakes,
            "over_floor": (round(pipe_p50 * 1e3 / floor["total_ms"], 2)
                           if floor["total_ms"] else None),
        },
        "p50": round(N_PAGES / p50, 2),
        "sequential_best": round(N_PAGES / best, 2),
        "first_iter_ms": round(times[0] * 1e3),
        "best_ms": round(best * 1e3),
        "p50_ms": round(p50 * 1e3),
        "iter_ms": [round(t * 1e3) for t in times],
        "anomalies": _anomalies(times, p50),
        "flakes": len(flake_msgs),
        "flake_msgs": flake_msgs,
        "per_stage_ms": _breakdown(med_summary, _STAGE_GROUPS),
        "link_ms": _breakdown(med_summary, _LINK_GROUPS),
        "link_floor": floor,
        "seq_link_floor": seq_floor,
        "p50_over_floor": (round(p50 * 1e3 / seq_floor["total_ms"], 2)
                           if seq_floor["total_ms"] else None),
        "link_retries": rt.link_retry_count,
        "degrade_counts": rt.degrade_counts,
        "overflow_counts": rt.overflow_counts,
        "recovery_counts": rt.recovery_counts,
        "dense_content": dense,
        "scanned_gray": scanned,
        "accuracy": accuracy,
        "mfu": round(flops / pipe_p50 / (PEAK_TFLOPS * 1e12), 4),
        "device_gflops_est": round(flops / 1e9),
        "h2d_mbps_ema": h2d_ema and round(h2d_ema),
        "d2h_mbps_ema": d2h_ema and round(d2h_ema),
        "d2h_rtt_ms_ema": rtt_ema and round(rtt_ema * 1e3, 1),
    }))


if __name__ == "__main__":
    main()

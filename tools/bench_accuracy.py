"""Accuracy bit for the bench artifact (VERDICT r4 item 3).

Runs `OAROCR.predict` on the bench's own pages (bench._make_pages, same
weights: the trained bench_det checkpoint + the blank-biased rec head)
and compares every output against the INDEPENDENT reference-semantics
oracle from tests/test_pipeline_golden.py — cv2/numpy re-derivations of
the reference's det postprocess (threshold/contour/minAreaRect/score/
unclip/scale-back, db_bitmap.rs) and rec chain (perspective crop →
resize-48 → BGR normalize → CTC last-max-wins/dedup-before-blank,
transform.rs + decode.rs), sharing only the model forwards.

Prints ONE JSON line {"box_iou", "text_match", ...} and exits non-zero
on any divergence, so bench.py can fail loudly (BASELINE.md's parity
bar: every perf number carries a correctness bit).

Runs in a scrubbed CPU subprocess (bench.py launches it with
JAX_PLATFORMS=cpu and the axon gate env removed): the oracle's rec
forward is an eager f32 `module.apply` while the TPU pipeline computes
in bf16 — comparing across dtypes would test numerics, not glue. On CPU
both sides run the identical dtype policy, so an exact-text comparison
is meaningful (the same reason tests/test_pipeline_golden.py runs on
the CPU backend).
"""

from __future__ import annotations

import importlib.util
import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ACC_PAGES = 2        # bench pages oracle-checked (~40 regions)
IOU_GATE = 0.95
CONF_GATE = 2e-2


def _load_module(name: str, path: pathlib.Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform != "cpu":
        print("bench_accuracy must run on the CPU backend "
              "(scrubbed subprocess) — see module docstring",
              file=sys.stderr)
        return 2

    import bench as bench_mod
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder

    oracle = _load_module("pipeline_golden_oracle",
                          REPO / "tests" / "test_pipeline_golden.py")
    parity = _load_module("parity_harness", REPO / "tools" / "parity.py")

    pages = bench_mod._make_pages(np.random.default_rng(0))[:ACC_PAGES]
    pipe = (OAROCRBuilder("general")
            .with_det_params(bench_mod._load_det_params())
            .with_rec_params(bench_mod._blank_biased_rec_params())
            .with_batch_sizes(image=ACC_PAGES, region=64).build())
    results = pipe.predict(pages)

    det = pipe.detector
    cfg = pipe.runtime.cfg
    from oar_ocr_tpu.models.recognition.recognizer import CropPlan
    from oar_ocr_tpu.runtime.runtime import stack_padded

    # the pipeline pads every crop in a chunk to the chunk-max width
    # bucket (ocr.rs:827); all bench regions pool into one chunk
    all_plans = [CropPlan.from_quad(0, oracle.order_points(
        np.asarray(r.box, np.float32)))
        for res in results for r in res.regions]
    if not all_plans:
        print("vacuous: predict found no regions", file=sys.stderr)
        return 1
    bucket_w = cfg.rec_width_buckets.bucket(max(p.width for p in all_plans))

    ious, conf_deltas = [], []
    mismatches = []
    n_regions = 0
    for page_i, (page, res) in enumerate(zip(pages, results)):
        h, w = page.shape[:2]
        plans = det.plan([(h, w)])
        out_h = cfg.det_side_buckets.bucket(plans[0].dst_h)
        out_w = cfg.det_side_buckets.bucket(plans[0].dst_w)
        ph = cfg.det_side_buckets.bucket(h)
        pw = cfg.det_side_buckets.bucket(w)
        pages_dev = pipe.runtime.put(stack_padded([page], (ph, pw)))
        nb = pipe.runtime.round_batch(cfg.det_batch_buckets.bucket(1))
        batch = pages_dev[jnp.asarray([0] * nb, jnp.int32)]
        prob_dev, _ = det._step(
            det.params, batch,
            jnp.asarray([plans[0].src_h] + [1] * (nb - 1), jnp.int32),
            jnp.asarray([plans[0].src_w] + [1] * (nb - 1), jnp.int32),
            jnp.asarray([plans[0].dst_h] + [1] * (nb - 1), jnp.int32),
            jnp.asarray([plans[0].dst_w] + [1] * (nb - 1), jnp.int32),
            jnp.float32(oracle.THRESH), out_h=out_h, out_w=out_w,
            dilate=False)
        prob = np.asarray(prob_dev, np.float32)[0, : plans[0].dst_h,
                                                : plans[0].dst_w]
        expected = oracle.oracle_det_boxes(prob, h, w)
        if len(expected) != len(res.regions):
            print(f"page {page_i}: box count oracle {len(expected)} vs "
                  f"predict {len(res.regions)}", file=sys.stderr)
            return 1
        used = set()
        for region in res.regions:
            n_regions += 1
            centers = [np.mean(b, axis=0) for b, _ in expected]
            rc = np.mean(region.box, axis=0)
            j = int(np.argmin([np.linalg.norm(c - rc) for c in centers]))
            if j in used:
                print(f"page {page_i}: duplicate oracle match",
                      file=sys.stderr)
                return 1
            used.add(j)
            ob, _oscore = expected[j]
            ious.append(parity.quad_iou(
                np.asarray(region.box, np.float32), ob.astype(np.float32)))
            text, conf = oracle.oracle_recognize(
                page, region.box, bucket_w, pipe.recognizer.model,
                pipe.recognizer.params, pipe.recognizer.decoder.charset)
            conf_deltas.append(abs(region.confidence - conf))
            if region.text != text:
                mismatches.append(
                    {"page": page_i, "ours": region.text, "oracle": text})

    box_iou = float(np.mean(ious))
    out = {
        "pages": ACC_PAGES,
        "regions": n_regions,
        "box_iou": round(box_iou, 4),
        "text_match": not mismatches,
        "max_conf_delta": round(float(np.max(conf_deltas)), 4),
        "backend": "cpu (scrubbed subprocess; identical code path — "
                   "dtype policy matches the oracle's eager forward)",
    }
    print(json.dumps(out))
    if mismatches:
        print(f"text mismatches: {mismatches[:5]}", file=sys.stderr)
        return 1
    if box_iou < IOU_GATE:
        print(f"box IoU {box_iou:.4f} < gate {IOU_GATE}", file=sys.stderr)
        return 1
    if max(conf_deltas) > CONF_GATE:
        print(f"confidence delta {max(conf_deltas):.4f} > {CONF_GATE}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

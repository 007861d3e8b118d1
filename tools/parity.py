"""Golden-output parity harness vs the CPU ONNX reference.

The BASELINE demands text + box-IoU parity with the reference
(BASELINE.md). This harness consumes *golden dumps* — JSON files produced
by running the reference's example binaries on a corpus — and compares our
pipeline's outputs:

  golden file format (one page per file):
    {"image": "page_001.png",
     "boxes": [[[x,y]×4], …],          # reference det quads
     "texts": ["…", …],                # reference rec texts (same order)
     "confidences": [0.98, …]}

Usage:
    python tools/parity.py --golden-dir dumps/ --images-dir pages/ \
        [--charset dict.txt] [--iou-thresh 0.5]

Reports per-page box recall/precision at the IoU threshold, exact-text
match rate over matched boxes, and mean confidence delta. Exits non-zero
when any metric falls below the gates. Runs in any environment with the
converted weights; without weights it still validates plumbing on a
synthetic self-comparison (--self-test).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def quad_iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two quads via their AABBs (matching the driver's box-IoU
    metric; polygon-exact IoU can be swapped in via cv2 if needed)."""

    ax0, ay0 = a.min(0)
    ax1, ay1 = a.max(0)
    bx0, by0 = b.min(0)
    bx1, by1 = b.max(0)
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    union = ((ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter)
    return inter / union if union > 0 else 0.0


def compare_page(golden: Dict, regions, iou_thresh: float) -> Dict:
    g_boxes = [np.asarray(b, np.float32).reshape(-1, 2)
               for b in golden["boxes"]]
    g_texts = golden.get("texts", [""] * len(g_boxes))
    ours = [(np.asarray(r.box, np.float32).reshape(-1, 2), r.text or "",
             float(r.confidence or 0.0)) for r in regions]

    matched = 0
    text_match = 0
    conf_delta = []
    used = set()
    for gi, gb in enumerate(g_boxes):
        best, best_iou = None, iou_thresh
        for oi, (ob, _, _) in enumerate(ours):
            if oi in used:
                continue
            v = quad_iou(gb, ob)
            if v >= best_iou:
                best, best_iou = oi, v
        if best is not None:
            used.add(best)
            matched += 1
            if ours[best][1] == g_texts[gi]:
                text_match += 1
            if "confidences" in golden:
                conf_delta.append(abs(ours[best][2]
                                      - golden["confidences"][gi]))
    n_g = max(len(g_boxes), 1)
    n_o = max(len(ours), 1)
    return {
        "recall": matched / n_g,
        "precision": matched / n_o,
        "text_match": text_match / max(matched, 1),
        "mean_conf_delta": float(np.mean(conf_delta)) if conf_delta else 0.0,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--golden-dir")
    ap.add_argument("--images-dir")
    ap.add_argument("--charset")
    ap.add_argument("--iou-thresh", type=float, default=0.5)
    ap.add_argument("--min-recall", type=float, default=0.95)
    ap.add_argument("--min-text-match", type=float, default=0.95)
    ap.add_argument("--self-test", action="store_true",
                    help="compare the pipeline against its own output "
                         "(plumbing check, no goldens needed)")
    args = ap.parse_args(argv)

    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
    from oar_ocr_tpu.utils.image import load_image

    b = OAROCRBuilder("general")
    if args.charset:
        b = b.with_charset_file(args.charset)
    if args.self_test:
        b = b.with_det_config(box_thresh=0.05, thresh=0.45)
    pipe = b.build()

    if args.self_test:
        img = np.full((240, 320, 3), 255, np.uint8)
        img[60:90, 30:280] = 15
        res = pipe.predict([img])[0]
        golden = {"image": "self",
                  "boxes": [r.box.tolist() for r in res.regions],
                  "texts": [r.text for r in res.regions],
                  "confidences": [r.confidence for r in res.regions]}
        m = compare_page(golden, res.regions, args.iou_thresh)
        print(json.dumps({"page": "self-test", **m}))
        ok = m["recall"] == 1.0 and m["text_match"] == 1.0
        return 0 if ok else 1

    assert args.golden_dir and args.images_dir, "--golden-dir/--images-dir"
    failures = 0
    for fn in sorted(os.listdir(args.golden_dir)):
        if not fn.endswith(".json"):
            continue
        golden = json.load(open(os.path.join(args.golden_dir, fn)))
        img = load_image(os.path.join(args.images_dir, golden["image"]))
        res = pipe.predict([img])[0]
        m = compare_page(golden, res.regions, args.iou_thresh)
        print(json.dumps({"page": golden["image"], **m}))
        if (m["recall"] < args.min_recall
                or m["text_match"] < args.min_text_match):
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

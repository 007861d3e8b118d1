"""Command-line interface.

The reference ships 15 clap example binaries as its CLI surface
(examples/*.rs — ocr.rs, structure.rs, text_detection.rs, …; SURVEY §1
L7). Here one `python -m oar_ocr_tpu.cli` entry point exposes the same
workflows as subcommands.
"""

from __future__ import annotations

import argparse
import json
from typing import List


def _load_images(paths: List[str]):
    import cv2
    import numpy as np

    from .errors import ImageLoadError

    images = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is None:
            raise ImageLoadError("cannot read image", path=p)
        images.append(np.ascontiguousarray(img[:, :, ::-1]))  # BGR→RGB
    return images


def cmd_ocr(args):
    from .pipelines.ocr import OAROCRBuilder

    b = OAROCRBuilder(args.text_type)
    if args.charset:
        b = b.with_charset_file(args.charset)
    if args.doc_orientation:
        b = b.with_doc_orientation()
    if args.rectify:
        b = b.with_doc_rectification()
    if args.textline_orientation:
        b = b.with_textline_orientation()
    if args.word_boxes:
        b = b.with_word_boxes()
    pipe = b.build()
    results = pipe.predict(_load_images(args.images))
    for path, res in zip(args.images, results):
        out = res.to_dict()
        out["source_path"] = path
        print(json.dumps(out, ensure_ascii=False))


def cmd_structure(args):
    from .pipelines.structure import OARStructureBuilder

    b = (OARStructureBuilder()
         .with_layout_variant(args.layout)
         .with_tables(not args.no_tables)
         .with_formulas(not args.no_formulas)
         .with_seals(not args.no_seals))
    pipe = b.build()
    results = pipe.predict(_load_images(args.images))
    for path, res in zip(args.images, results):
        res.source_path = path
        if args.format == "markdown":
            print(res.to_markdown())
        elif args.format == "html":
            print(res.to_html())
        else:
            print(json.dumps(res.to_json_value(), ensure_ascii=False))
        if args.output_dir:
            import os

            stem = os.path.splitext(os.path.basename(path))[0]
            res.save_results(args.output_dir, stem)


def cmd_detect(args):
    from .predictors.predictors import TextDetectionPredictor
    from .tasks.tasks import TextDetectionConfig

    p = TextDetectionPredictor(TextDetectionConfig(
        box_thresh=args.box_thresh, thresh=args.thresh))
    for path, (boxes, scores) in zip(
            args.images, p.predict(_load_images(args.images))):
        print(json.dumps({
            "source_path": path,
            "boxes": [b.tolist() for b in boxes],
            "scores": scores,
        }))


def cmd_recognize(args):
    from .predictors.predictors import TextRecognitionPredictor
    from .tasks.tasks import TextRecognitionConfig

    p = TextRecognitionPredictor(TextRecognitionConfig(
        charset_path=args.charset))
    for path, (text, conf) in zip(
            args.images, p.predict(_load_images(args.images))):
        print(json.dumps({"source_path": path, "text": text,
                          "confidence": conf}, ensure_ascii=False))


def cmd_layout(args):
    from .predictors.predictors import LayoutDetectionPredictor
    from .tasks.tasks import LayoutDetectionConfig

    p = LayoutDetectionPredictor(LayoutDetectionConfig(
        variant=args.variant, score_thresh=args.score_thresh))
    for path, boxes in zip(args.images, p.predict(_load_images(args.images))):
        print(json.dumps({
            "source_path": path,
            "elements": [{"label": b.label, "score": b.score,
                          "box": b.box.tolist()} for b in boxes],
        }))


def cmd_vl(args):
    from .vl.model import PaddleOCRVL
    from .vl.paddleocr_vl import PaddleOCRVLConfig

    cfg = PaddleOCRVLConfig()
    if args.dev_tiny:
        cfg = cfg.tiny()
    vlm = PaddleOCRVL(cfg=cfg)
    for path, res in zip(args.images, vlm.generate(
            _load_images(args.images), task=args.task,
            max_new_tokens=args.max_new_tokens)):
        print(json.dumps({"source_path": path, "text": res.text},
                         ensure_ascii=False))


def cmd_vlm(args):
    """Any VLM family by registry name, running its EXACT architecture
    (vl/exact_models.exact_from_registry)."""
    from .vl.exact_models import exact_from_registry

    from .vl.model import PaddleOCRVL

    model = exact_from_registry(args.model, tiny=args.dev_tiny)
    images = _load_images(args.images)
    if isinstance(model, PaddleOCRVL):
        # task-prompted interface (TASK_PROMPTS) instead of free text
        outs = model.generate(images, "ocr",
                              max_new_tokens=args.max_new_tokens)
    else:
        outs = model.generate(images, args.instruction,
                              max_new_tokens=args.max_new_tokens)
    texts = [o.text if hasattr(o, "text") else o for o in outs]
    for path, text in zip(args.images, texts):
        print(json.dumps({"source_path": path, "model": args.model,
                          "text": text}, ensure_ascii=False))


def cmd_bench(args):
    import runpy

    runpy.run_path("bench.py", run_name="__main__")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="oar_ocr_tpu",
        description="TPU-native document OCR / layout analysis")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("ocr", help="full det+rec OCR pipeline")
    p.add_argument("images", nargs="+")
    p.add_argument("--text-type", default="general",
                   choices=["general", "table", "seal"])
    p.add_argument("--charset")
    p.add_argument("--doc-orientation", action="store_true")
    p.add_argument("--rectify", action="store_true")
    p.add_argument("--textline-orientation", action="store_true")
    p.add_argument("--word-boxes", action="store_true")
    p.set_defaults(fn=cmd_ocr)

    p = sub.add_parser("structure", help="document structure analysis")
    p.add_argument("images", nargs="+")
    p.add_argument("--layout", default="pp-doclayout_plus-l")
    p.add_argument("--format", default="markdown",
                   choices=["markdown", "html", "json"])
    p.add_argument("--output-dir")
    p.add_argument("--no-tables", action="store_true")
    p.add_argument("--no-formulas", action="store_true")
    p.add_argument("--no-seals", action="store_true")
    p.set_defaults(fn=cmd_structure)

    p = sub.add_parser("detect", help="text detection only")
    p.add_argument("images", nargs="+")
    p.add_argument("--thresh", type=float, default=0.3)
    p.add_argument("--box-thresh", type=float, default=0.6)
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser("recognize", help="recognize pre-cropped lines")
    p.add_argument("images", nargs="+")
    p.add_argument("--charset")
    p.set_defaults(fn=cmd_recognize)

    p = sub.add_parser("layout", help="layout detection only")
    p.add_argument("images", nargs="+")
    p.add_argument("--variant", default="pp-doclayout_plus-l")
    p.add_argument("--score-thresh", type=float, default=0.5)
    p.set_defaults(fn=cmd_layout)

    p = sub.add_parser("vl", help="vision-language document parsing")
    p.add_argument("images", nargs="+")
    p.add_argument("--task", default="ocr")
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--dev-tiny", action="store_true",
                   help="use the development-size model (no weights)")
    p.set_defaults(fn=cmd_vl)

    p = sub.add_parser("vlm", help="any VLM family by registry name "
                                   "(exact architecture)")
    p.add_argument("model", help="registry name, e.g. mineru-2.5, "
                                 "glm-ocr, hunyuanocr-1.5")
    p.add_argument("images", nargs="+")
    p.add_argument("--instruction", default="OCR:")
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--dev-tiny", action="store_true",
                   help="use the development-size config (no weights)")
    p.set_defaults(fn=cmd_vlm)

    p = sub.add_parser("bench", help="run the throughput benchmark")
    p.set_defaults(fn=cmd_bench)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

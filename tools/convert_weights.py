"""Convert deploy-format checkpoints into oar_ocr_tpu artifacts.

The round-2 entry point for real weights: takes a directory of source
tensors (safetensors exported from Paddle/ONNX deploy models — e.g. via
`paddle2onnx` + a tensor dump, or HF safetensors for the VLMs), maps them
through the model's ConversionMap (runtime/convert_maps.py), verifies
completeness, and writes the flat-safetensors artifact the registry
expects ($OAR_TPU_HOME/models/<file>).

Usage:
    python tools/convert_weights.py --model pp-ocrv5_mobile_det \
        --source dumps/det_tensors.safetensors [--out-dir ~/.oar_ocr_tpu/models]
    python tools/convert_weights.py --model pp-ocrv5_mobile_det --describe

--describe prints the expected source tensor names/shapes so the dump side
can be matched without trial and error. Name mapping defaults to the
mechanical renamer (convert_maps._default_renamer); per-model exceptions
register in MODEL_BUILDERS below as real checkpoints are brought up.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Conversion is a host job: force the CPU backend before anything touches
# jax (the axon sitecustomize force-registers the TPU backend; an env var
# alone does not switch — docs/environment-variables.md).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _build_db(variant: str):
    from oar_ocr_tpu.models.detection.db import DBNet
    from oar_ocr_tpu.runtime.runtime import init_params

    backbone = "hgnet" if "server" in variant else "lcnet"
    model = DBNet(backbone=backbone)
    return init_params(model, (1, 64, 64, 3))


# Known dictionary entry counts (reference registry.rs assets; vocab =
# 1 blank + chars + 1 space, CTCLabelDecoder convention). Used when the
# companion dict file is not on disk.
KNOWN_DICT_LENS = {
    "ppocr_keys_v1.txt": 6623,
    "ppocrv5_dict.txt": 18383,
}


def _rec_vocab_size(variant: str) -> int:
    """Resolve the CTC head's vocab from the registry entry's companion
    charset file (ADVICE r1: v5/v6 dictionaries are ~18k entries, not the
    v1 6623 — hard-coding 6625 breaks every v5/v6 rec ConversionMap)."""
    from oar_ocr_tpu.ops.ctc import load_charset
    from oar_ocr_tpu.registry.models import MODEL_REGISTRY, asset_path

    entry = MODEL_REGISTRY.get(variant)
    charset = entry.charset if entry else None
    if charset:
        path = asset_path(charset)
        if path and os.path.exists(path):
            return 1 + len(load_charset(path)) + 1   # blank + chars + space
        if charset in KNOWN_DICT_LENS:
            return 1 + KNOWN_DICT_LENS[charset] + 1
    print(f"warning: no charset info for {variant!r}; assuming the v1 "
          "6623-entry dictionary", file=sys.stderr)
    return 6625


def _build_rec(variant: str):
    from oar_ocr_tpu.models.recognition.svtr import SVTRRecognizer
    from oar_ocr_tpu.runtime.runtime import init_params

    backbone = "hgnet" if "server" in variant else "lcnet"
    model = SVTRRecognizer(vocab_size=_rec_vocab_size(variant),
                           backbone=backbone)
    return init_params(model, (1, 48, 320, 3))


def _build_cls(variant: str):
    from oar_ocr_tpu.models.classification.pp_lcnet import (
        doc_orientation_classifier, table_classifier,
        textline_orientation_classifier)

    if "textline" in variant:
        return textline_orientation_classifier().params
    if "table" in variant:
        return table_classifier().params
    return doc_orientation_classifier().params


def _build_table_structure(variant: str):
    # SLANeXt_wired/_wireless run the Vary-ViT-B topology
    # (slanext_exact.py; wired 512 / wireless 488 canvases,
    # model_input.rs:322-360); SLANet / SLANet_plus the PP-LCNet+CSPPAN
    # one (slanet_exact.py).  plus/next use 8-dof cell boxes, en 4-dof.
    if "slanext" in variant:
        from oar_ocr_tpu.models.recognition.slanext_exact import \
            SLANeXtExactModel

        size = 512 if "wired" in variant else 488
        return SLANeXtExactModel(input_size=size).params
    from oar_ocr_tpu.models.recognition.slanet_exact import SLANetExactModel

    loc = 4 if variant == "slanet" else 8
    return SLANetExactModel(loc_reg_num=loc).params


def _build_formula(variant: str):
    from oar_ocr_tpu.models.recognition.pp_formulanet_exact import (
        PPFormulaNetConfig, PPFormulaNetRecognizer)

    # -S / plus-S share one topology (byte-identical exports); -L /
    # plus-L run the Vary-ViT tower (pp_formulanet_exact.VaryConfig).
    # plus-M dims are unpinned — fail loudly rather than guess.
    if variant.endswith("-m"):
        raise SystemExit(f"{variant}: plus-M dims not pinned yet; "
                         "read them off the checkpoint and extend "
                         "PPFormulaNetConfig")
    cfg = PPFormulaNetConfig()
    if variant.endswith("-l"):
        cfg = cfg.large()
    return PPFormulaNetRecognizer(cfg=cfg).params


MODEL_BUILDERS = {
    "text_detection": _build_db,
    "seal_text_detection": _build_db,
    "text_recognition": _build_rec,
    "document_orientation": _build_cls,
    "textline_orientation": _build_cls,
    "table_classification": _build_cls,
    "table_structure_recognition": _build_table_structure,
    "formula_recognition": _build_formula,
}

# tasks whose flax trees carry the official PaddleOCR/PaddleClas deploy
# names (walker-generated maps, golden-validated in tests/)
_OFFICIAL_NAME_TASKS = {
    "text_detection", "seal_text_detection", "text_recognition",
    "document_orientation", "textline_orientation", "table_classification",
    "table_structure_recognition",
}


# ---------------------------------------------------------------------------
# --selftest: round-trip every registered conversion map (VERDICT r3 item 8)
# ---------------------------------------------------------------------------

def _build_layout(variant: str):
    from oar_ocr_tpu.models.detection.layout import LayoutDetector

    return LayoutDetector(variant).params


def _build_uvdoc(variant: str):
    from oar_ocr_tpu.models.rectification.uvdoc import UVDocRectifier

    return UVDocRectifier().params


def _build_vlm_tiny(variant: str):
    """Tiny-dims VLM build for the map selftest: the conversion map's RULE
    LOGIC (names, transforms, completeness) is dimension-independent, and
    real dims would cost tens of GB of host RAM. Real-dims validation
    happens at conversion time against the checkpoint's config.json
    (ROADMAP 'converge at conversion time')."""
    if variant.startswith("paddleocr-vl"):
        from oar_ocr_tpu.vl.model import PaddleOCRVL
        from oar_ocr_tpu.vl.paddleocr_vl import PaddleOCRVLConfig

        return PaddleOCRVL(cfg=PaddleOCRVLConfig().tiny()).params
    if variant.startswith("hunyuanocr"):
        import jax
        import jax.numpy as jnp

        from oar_ocr_tpu.vl.hunyuan import (HunyuanOCRConfig,
                                            HunyuanOCRModule)

        cfg = HunyuanOCRConfig().tiny()
        f = HunyuanOCRModule(cfg)
        p2 = cfg.v_patch ** 2 * 3
        return f.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4, p2), jnp.float32),
                      jnp.zeros((4, cfg.v_dim), jnp.float32), 2, 2,
                      jnp.zeros((1, 4), jnp.int32),
                      jnp.zeros((4, 1, 4), jnp.int32),
                      method=HunyuanOCRModule.init_all)
    from oar_ocr_tpu.vl.exact_models import exact_from_registry

    return exact_from_registry(variant, tiny=True).params


def _vlm_map(variant: str, params):
    from oar_ocr_tpu.runtime.ppocr_maps import build_hunyuan_map, build_vl_map

    if variant.startswith("paddleocr-vl"):
        return build_vl_map(params, name=variant)
    # the hf-layout superset map (dense transpose + OIHW convs + patch
    # conv) — the renamer every HF-layout family documents
    return build_hunyuan_map(params, name=variant)


def _inverse_registry():
    """Transform → inverse, keyed by function identity. Every transform
    any registered ConversionMap uses must appear here or the selftest
    fails loudly."""
    from oar_ocr_tpu.runtime import ppocr_maps as pm
    from oar_ocr_tpu.runtime import weights as w

    def conv_back(v):                      # HWIO → OIHW
        return np.transpose(v, (3, 2, 0, 1))

    def dense_back(v):                     # (in, out) → (out, in)
        return np.transpose(v, (1, 0))

    def deconv_back(v):                    # HWIO → IOHW + undo spatial flip
        return np.transpose(v[::-1, ::-1], (2, 3, 0, 1))

    def patch_back(v):                     # (p·p·3, d) → (d, 3, p, p)
        p2c, d = v.shape
        p = int(round((p2c // 3) ** 0.5))
        return np.transpose(v.reshape(p, p, 3, d), (3, 2, 0, 1))

    return {
        None: lambda v: v,
        w.conv_oihw_to_hwio: conv_back,
        w.dense_oi_to_io: dense_back,
        pm._conv_oihw_to_hwio: conv_back,
        pm._deconv_iohw_to_hwio: deconv_back,
        pm._hf_dense: dense_back,
        pm._hf_patch_conv: patch_back,
    }


def _export_for_map(cm, params):
    """Synthesize the deploy-format tensor dict a map expects by applying
    the exact inverse of each rule's transform to our own params — the
    generic oracle fixture (no real checkpoint needed). Also asserts the
    map covers every flax leaf (both-way completeness) and that no two
    leaves collide on one source name."""
    from oar_ocr_tpu.runtime.weights import flatten_params

    inv = _inverse_registry()
    flat = flatten_params(params)
    targets = {t for t, _, _ in cm.rules}
    missing = set(flat) - targets
    assert not missing, f"map misses {len(missing)} leaves: {sorted(missing)[:5]}"
    deploy = {}
    for target, source, transform in cm.rules:
        if transform not in inv:
            raise AssertionError(
                f"no inverse registered for transform {transform} "
                f"(rule {target} <- {source})")
        if source in deploy:
            raise AssertionError(f"source name collision: {source}")
        deploy[source] = inv[transform](np.asarray(flat[target]))
    return deploy


def _selftest_build(entry, variant: str):
    """(params, conversion_map) for one registry entry, built exactly the
    way ``main`` builds them."""
    task = entry.task
    if task in ("layout_detection", "table_cell_detection"):
        from oar_ocr_tpu.runtime.ppocr_maps import build_ppocr_map

        params = _build_layout(variant)
        return params, build_ppocr_map(params, name=variant)
    if task == "document_rectification":
        from oar_ocr_tpu.runtime.ppocr_maps import build_ppocr_map

        params = _build_uvdoc(variant)
        return params, build_ppocr_map(params, name=variant)
    if task == "vlm":
        params = _build_vlm_tiny(variant)
        return params, _vlm_map(variant, params)
    if task == "formula_recognition":
        if "formulanet" in variant:
            from oar_ocr_tpu.models.recognition.pp_formulanet_exact import \
                build_formulanet_map

            params = _build_formula(variant)
            return params, build_formulanet_map(params, name=variant)
        if variant == "unimernet":
            # hf-layout map, as test_unimernet_parity validates
            from oar_ocr_tpu.models.recognition.unimernet import (
                UniMERNetConfig, UniMERNetRecognizer)
            from oar_ocr_tpu.runtime.ppocr_maps import build_hunyuan_map

            params = UniMERNetRecognizer(cfg=UniMERNetConfig().tiny()).params
            return params, build_hunyuan_map(params, name=variant)
        raise _SelftestSkip(f"no builder for formula variant {variant!r}")
    builder = MODEL_BUILDERS.get(task)
    if builder is None:
        raise _SelftestSkip(f"no builder wired for task {task!r}")
    params = builder(variant)
    from oar_ocr_tpu.runtime.ppocr_maps import build_ppocr_map

    return params, build_ppocr_map(params, name=variant)


class _SelftestSkip(Exception):
    pass


def selftest(filter_substr: str = "") -> int:
    """Round-trip every registered conversion map against a synthesized
    oracle fixture: export our own params through the exact inverse of
    each map rule, convert back, require bitwise tree equality and
    zero missing/unused tensors. Keeps the registry's conversion path
    executable end-to-end while real checkpoints are unobtainable
    (zero-egress; reference download/registry.rs:22 parity bar)."""
    from oar_ocr_tpu.registry.models import MODEL_REGISTRY
    from oar_ocr_tpu.runtime.weights import flatten_params

    def dedupe_key(entry, variant):
        """Entries sharing one topology (same builder output + map) are
        built once; the map is name-derived from the tree, so identical
        topology ⇒ identical rules."""
        t = entry.task
        if t in ("text_detection", "seal_text_detection"):
            return (t, "server" in variant)
        if t == "text_recognition":
            return (t, "server" in variant, _rec_vocab_size(variant))
        if t == "table_structure_recognition":
            if "slanext" in variant:
                return (t, "slanext", "wired" in variant)
            return (t, "slanet", variant == "slanet")
        return (t, variant)

    memo = {}
    ok = skipped = failed = 0
    for variant in sorted(MODEL_REGISTRY):
        if filter_substr and filter_substr not in variant:
            continue
        entry = MODEL_REGISTRY[variant]
        key = dedupe_key(entry, variant)
        try:
            if key in memo:
                params, cm = memo[key]
            else:
                params, cm = _selftest_build(entry, variant)
                memo[key] = (params, cm)
            deploy = _export_for_map(cm, params)
            back = cm.convert(deploy, strict=True)
            unused = cm.unused_sources(deploy)
            assert not unused, f"{len(unused)} unused sources"
            a, b = flatten_params(params), flatten_params(back)
            assert set(a) == set(b)
            for k in a:
                av, bv = np.asarray(a[k]), np.asarray(b[k])
                assert av.shape == bv.shape and (av == bv).all(), k
            tag = " (tiny dims)" if entry.task == "vlm" or \
                variant == "unimernet" else ""
            print(f"ok    {variant}  [{entry.task}] "
                  f"{len(cm.rules)} tensors{tag}")
            ok += 1
        except _SelftestSkip as e:
            print(f"SKIP  {variant}  {e}")
            skipped += 1
        except SystemExit as e:
            print(f"SKIP  {variant}  {e}")
            skipped += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {variant}  {type(e).__name__}: {e}")
            failed += 1
    print(f"selftest: {ok} ok, {skipped} skipped, {failed} failed "
          f"of {ok + skipped + failed}")
    return 1 if failed else 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model",
                    help="registry name (oar_ocr_tpu.registry.models)")
    ap.add_argument("--selftest", action="store_true",
                    help="round-trip every registered conversion map "
                         "against a synthesized oracle fixture (export "
                         "own params via exact rule inverses, convert "
                         "back, require bitwise equality)")
    ap.add_argument("--filter", default="",
                    help="with --selftest: only variants containing this")
    ap.add_argument("--source", help="source safetensors of deploy tensors")
    ap.add_argument("--out-dir")
    ap.add_argument("--describe", action="store_true",
                    help="print expected source tensor names/shapes")
    ap.add_argument("--non-strict", action="store_true",
                    help="tolerate missing source tensors")
    ap.add_argument("--make-fixture",
                    help="write a deploy-format fixture with official "
                         "tensor names (torch golden reference, random "
                         "weights) to this path — lets the conversion "
                         "path be exercised without real checkpoints")
    args = ap.parse_args(argv)

    if args.selftest:
        return selftest(args.filter)
    if not args.model:
        ap.error("--model is required (or use --selftest)")

    if args.make_fixture:
        from safetensors.numpy import save_file

        import tools.torch_ref as tr

        if "det" in args.model:
            t = tr.DBNetTorch(scale=0.75)
        else:
            t = tr.SVTRRecTorch(vocab=_rec_vocab_size(args.model))
        tr.seed_all(t)
        save_file(tr.paddle_state_dict(t), args.make_fixture)
        print(f"wrote fixture {args.make_fixture}")
        if not args.source:
            return 0

    from oar_ocr_tpu.registry.models import MODEL_REGISTRY, OAR_TPU_HOME
    from oar_ocr_tpu.runtime.convert_maps import (build_model_map,
                                                  export_deploy_format)
    from oar_ocr_tpu.runtime.weights import save_params

    entry = MODEL_REGISTRY.get(args.model)
    if entry is None:
        print(f"unknown model {args.model!r}; known:", file=sys.stderr)
        for name in sorted(MODEL_REGISTRY):
            print(" ", name, file=sys.stderr)
        return 2
    builder = MODEL_BUILDERS.get(entry.task)
    if builder is None:
        print(f"no builder wired for task {entry.task!r} yet "
              "(add to MODEL_BUILDERS)", file=sys.stderr)
        return 2

    params = builder(args.model)
    if entry.task == "formula_recognition":
        # mixed map: paddle names + HF-layout MBart decoder subtree
        from oar_ocr_tpu.models.recognition.pp_formulanet_exact import \
            build_formulanet_map

        cm = build_formulanet_map(params, name=args.model)
    elif entry.task in _OFFICIAL_NAME_TASKS:
        # official PaddleOCR/PaddleClas deploy tensor names
        # (runtime/ppocr_maps.py), golden-validated in tests/
        from oar_ocr_tpu.runtime.ppocr_maps import build_ppocr_map

        cm = build_ppocr_map(params, name=args.model)
    else:
        cm = build_model_map(params, name=args.model)

    if args.describe:
        for target, source, _ in cm.rules:
            print(f"{source}")
        return 0

    assert args.source, "--source required unless --describe"
    from safetensors.numpy import load_file

    # upstream provenance check (registry.rs download-with-verification):
    # when converting from the raw upstream artifact, its SHA-256 must
    # match the pinned table. Converted/intermediate files skip this.
    from oar_ocr_tpu.registry.models import (sha256_file,
                                             upstream_provenance)

    prov = upstream_provenance(entry)
    if prov and entry.source and os.path.basename(args.source) == entry.source:
        actual = sha256_file(args.source)
        if actual != prov[0]:
            print(f"upstream checksum mismatch for {entry.source}: "
                  f"expected {prov[0]}, got {actual}", file=sys.stderr)
            return 3

    source = load_file(args.source)
    tree = cm.convert(source, strict=not args.non_strict)
    unused = cm.unused_sources(source)
    if unused:
        print(f"note: {len(unused)} source tensors unused "
              f"(first: {unused[:5]})", file=sys.stderr)

    out_dir = args.out_dir or os.path.join(OAR_TPU_HOME, "models")
    out_path = os.path.join(out_dir, entry.filename)
    save_params(tree, out_path)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Model registry + asset resolution.

Re-expresses the reference's auto-download subsystem (oar-ocr-core/src/
core/download/mod.rs:1-638 — ModelScope download with SHA-256 verification
into $OAR_HOME; static 98-entry registry in registry.rs:22ff) for the TPU
build: the registry points at **converted-weight artifacts** (safetensors
/ orbax checkpoints of the flax models plus their dictionaries) rather
than ONNX files. In this zero-egress environment download is disabled;
resolution covers explicit paths, $OAR_TPU_HOME cache hits, and registry
metadata, raising a structured error when an asset is genuinely absent.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from dataclasses import dataclass
from typing import Dict, Optional

from ..errors import DownloadError, ModelLoadError

OAR_TPU_HOME = os.environ.get(
    "OAR_TPU_HOME", os.path.join(os.path.expanduser("~"), ".oar_ocr_tpu"))


@dataclass(frozen=True)
class ModelEntry:
    """One registry entry (download/registry.rs Entry analog)."""

    name: str
    task: str
    filename: str
    sha256: Optional[str] = None
    charset: Optional[str] = None       # companion dictionary file
    notes: str = ""


# The classic-model registry. Checksums are filled when weight conversion
# produces the artifacts (round ≥2); names mirror the reference registry's
# model set so users find the same lineup.
MODEL_REGISTRY: Dict[str, ModelEntry] = {e.name: e for e in [
    # detection
    ModelEntry("pp-ocrv5_mobile_det", "text_detection", "pp-ocrv5_mobile_det.safetensors"),
    ModelEntry("pp-ocrv5_server_det", "text_detection", "pp-ocrv5_server_det.safetensors"),
    ModelEntry("pp-ocrv4_mobile_det", "text_detection", "pp-ocrv4_mobile_det.safetensors"),
    ModelEntry("pp-ocrv4_server_det", "text_detection", "pp-ocrv4_server_det.safetensors"),
    ModelEntry("pp-ocrv6_tiny_det", "text_detection", "pp-ocrv6_tiny_det.safetensors"),
    ModelEntry("pp-ocrv6_small_det", "text_detection", "pp-ocrv6_small_det.safetensors"),
    ModelEntry("pp-ocrv6_medium_det", "text_detection", "pp-ocrv6_medium_det.safetensors"),
    ModelEntry("seal_det", "seal_text_detection", "seal_det.safetensors"),
    # recognition
    ModelEntry("pp-ocrv5_mobile_rec", "text_recognition",
               "pp-ocrv5_mobile_rec.safetensors", charset="ppocrv5_dict.txt"),
    ModelEntry("pp-ocrv5_server_rec", "text_recognition",
               "pp-ocrv5_server_rec.safetensors", charset="ppocrv5_dict.txt"),
    ModelEntry("pp-ocrv4_mobile_rec", "text_recognition",
               "pp-ocrv4_mobile_rec.safetensors", charset="ppocr_keys_v1.txt"),
    ModelEntry("pp-ocrv6_tiny_rec", "text_recognition",
               "pp-ocrv6_tiny_rec.safetensors", charset="ppocrv6_dict.txt"),
    ModelEntry("pp-ocrv6_small_rec", "text_recognition",
               "pp-ocrv6_small_rec.safetensors", charset="ppocrv6_dict.txt"),
    ModelEntry("pp-ocrv6_medium_rec", "text_recognition",
               "pp-ocrv6_medium_rec.safetensors", charset="ppocrv6_dict.txt"),
    ModelEntry("svtrv2_rec", "text_recognition", "svtrv2_rec.safetensors",
               charset="ppocrv5_dict.txt"),
    ModelEntry("repsvtr_rec", "text_recognition", "repsvtr_rec.safetensors",
               charset="ppocrv5_dict.txt"),
    # classification
    ModelEntry("pplcnet_x1_0_doc_ori", "document_orientation",
               "pplcnet_doc_ori.safetensors"),
    ModelEntry("pplcnet_x0_25_textline_ori", "textline_orientation",
               "pplcnet_textline_ori.safetensors"),
    ModelEntry("pplcnet_table_cls", "table_classification",
               "pplcnet_table_cls.safetensors"),
    # rectification
    ModelEntry("uvdoc", "document_rectification", "uvdoc.safetensors"),
    # layout (one entry per variant in domain/layout.py)
    *[ModelEntry(v, "layout_detection", f"{v}.safetensors")
      for v in ("picodet_layout_1x", "picodet_layout_1x_table",
                "picodet-s_layout_3cls", "picodet-l_layout_3cls",
                "picodet-s_layout_17cls", "picodet-l_layout_17cls",
                "rt-detr-h_layout_3cls", "rt-detr-h_layout_17cls",
                "pp-docblocklayout", "pp-doclayout-s", "pp-doclayout-m",
                "pp-doclayout-l", "pp-doclayout_plus-l", "pp-doclayoutv2",
                "pp-doclayoutv3")],
    ModelEntry("rt-detr-l_wired_table_cell_det", "table_cell_detection",
               "rtdetr_wired_cell.safetensors"),
    ModelEntry("rt-detr-l_wireless_table_cell_det", "table_cell_detection",
               "rtdetr_wireless_cell.safetensors"),
    # tables / formulas
    ModelEntry("slanet", "table_structure_recognition", "slanet.safetensors"),
    ModelEntry("slanet_plus", "table_structure_recognition",
               "slanet_plus.safetensors"),
    ModelEntry("slanext", "table_structure_recognition", "slanext.safetensors"),
    ModelEntry("pp-formulanet-s", "formula_recognition",
               "pp-formulanet-s.safetensors", charset="formula_vocab.json"),
    ModelEntry("pp-formulanet-plus-m", "formula_recognition",
               "pp-formulanet-plus-m.safetensors", charset="formula_vocab.json"),
    ModelEntry("unimernet", "formula_recognition", "unimernet.safetensors",
               charset="unimernet_vocab.json"),
    # VLM families (vl/families.py + vl/model.py); charset = HF tokenizer
    ModelEntry("paddleocr-vl-0.9b", "vlm", "paddleocr_vl.safetensors",
               charset="paddleocr_vl_tokenizer.json"),
    ModelEntry("paddleocr-vl-1.5", "vlm", "paddleocr_vl_15.safetensors",
               charset="paddleocr_vl_tokenizer.json"),
    ModelEntry("paddleocr-vl-1.6", "vlm", "paddleocr_vl_16.safetensors",
               charset="paddleocr_vl_tokenizer.json"),
    ModelEntry("hunyuanocr-1.5", "vlm", "hunyuanocr_15.safetensors",
               charset="hunyuan_tokenizer.json"),
    ModelEntry("hunyuanocr-1.0", "vlm", "hunyuanocr_10.safetensors",
               charset="hunyuan_tokenizer.json"),
    ModelEntry("glm-ocr", "vlm", "glmocr.safetensors",
               charset="glm_tokenizer.json"),
    ModelEntry("mineru-2.5", "vlm", "mineru25.safetensors",
               charset="qwen2_tokenizer.json"),
    ModelEntry("mineru-2.5-pro", "vlm", "mineru25_pro.safetensors",
               charset="qwen2_tokenizer.json"),
    ModelEntry("mineru-diffusion-v1", "vlm", "mineru_diffusion.safetensors",
               charset="qwen2_tokenizer.json"),
    ModelEntry("hpd-parsing-1b", "vlm", "hpd_parsing.safetensors",
               charset="internlm_tokenizer.json"),
    ModelEntry("ovisocr2-0.8b", "vlm", "ovisocr2.safetensors",
               charset="qwen3_tokenizer.json"),
    ModelEntry("monkeyocrv2-s", "vlm", "monkeyocrv2_s.safetensors",
               charset="qwen2_tokenizer.json"),
    ModelEntry("monkeyocrv2-b", "vlm", "monkeyocrv2_b.safetensors",
               charset="qwen2_tokenizer.json"),
]}


def asset_path(filename: str) -> Optional[str]:
    """Locate a companion asset (dictionary / tokenizer file): in-repo
    ``assets/`` first, then the $OAR_TPU_HOME/assets cache. Returns None
    when absent (callers fall back to documented defaults)."""

    repo_assets = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "assets")
    for base in (repo_assets, os.path.join(OAR_TPU_HOME, "assets")):
        p = os.path.join(base, filename)
        if os.path.exists(p):
            return p
    return None


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def resolve_model_path(name_or_path: str, *, verify: bool = True) -> str:
    """Resolve a model asset: explicit path → as-is; registry name →
    $OAR_TPU_HOME cache (download/mod.rs resolve_path semantics, minus the
    network which this environment forbids)."""

    if os.path.exists(name_or_path):
        return name_or_path
    entry = MODEL_REGISTRY.get(name_or_path)
    if entry is None:
        raise ModelLoadError("unknown model and path does not exist",
                             model=name_or_path)
    cached = os.path.join(OAR_TPU_HOME, "models", entry.filename)
    if os.path.exists(cached):
        if verify and entry.sha256:
            actual = sha256_file(cached)
            if actual != entry.sha256:
                raise DownloadError("checksum mismatch", model=entry.name,
                                    expected=entry.sha256, actual=actual)
        return cached
    raise DownloadError(
        "model asset not cached and downloads are disabled in this "
        "environment; place the converted weights at the cache path",
        model=entry.name, cache_path=cached)

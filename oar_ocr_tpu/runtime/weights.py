"""Weight serialization and conversion toolchain.

Replaces the reference's model loading (ONNX files / safetensors via
Candle VarBuilder — model_source.rs:21-28, SURVEY §5 checkpoint notes)
with the TPU build's artifact format: **flat safetensors** checkpoints of
the flax param pytrees ('/'-joined key paths), plus conversion helpers
that map deploy-format tensors (Paddle/ONNX exports: OIHW convs, [out,in]
dense) into the NHWC/flax layout.

``ModelSource`` keeps the reference's path-or-bytes semantics so models
can be loaded from memory (e.g. pre-fetched artifacts) as well as disk.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, Mapping, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ModelLoadError


@dataclass(frozen=True)
class ModelSource:
    """Path or in-memory bytes (core/inference/model_source.rs:21-28)."""

    path: Optional[str] = None
    data: Optional[bytes] = None

    @staticmethod
    def from_path(path: str) -> "ModelSource":
        return ModelSource(path=path)

    @staticmethod
    def from_bytes(data: bytes) -> "ModelSource":
        return ModelSource(data=data)

    def read(self) -> bytes:
        if self.data is not None:
            return self.data
        if self.path is None:
            raise ModelLoadError("empty ModelSource")
        with open(self.path, "rb") as f:
            return f.read()


def flatten_params(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flax pytree → flat {'a/b/c': array} dict."""
    flat = {}
    items = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in items:
        key = "/".join(_path_part(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_part(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def unflatten_params(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Flat dict → nested dict pytree."""
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_params(params: Any, path: str) -> None:
    """Write a flax param tree as flat safetensors."""
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file({k: np.ascontiguousarray(v)
               for k, v in flatten_params(params).items()}, path)


def load_params(source: Union[str, ModelSource]) -> Dict[str, Any]:
    """Load a flat-safetensors checkpoint into a nested param tree."""
    from safetensors.numpy import load, load_file

    if isinstance(source, str):
        source = ModelSource.from_path(source)
    try:
        if source.path is not None:
            flat = load_file(source.path)
        else:
            flat = load(source.read())
    except Exception as e:
        raise ModelLoadError("failed to read checkpoint",
                             path=source.path) from e
    return unflatten_params(flat)


# ------------------------- deploy-format conversion -------------------------

def conv_oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    """Paddle/ONNX conv kernel (O, I, kH, kW) → flax (kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def depthwise_oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    """Depthwise (C, 1, kH, kW) → flax grouped-conv (kH, kW, 1, C)."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_oi_to_io(w: np.ndarray) -> np.ndarray:
    """Dense (out, in) → flax (in, out)."""
    return np.transpose(w, (1, 0))


def fold_batchnorm(gamma, beta, mean, var, eps: float = 1e-5):
    """Return flax BatchNorm inference params {scale, bias, mean, var}."""
    return {"scale": np.asarray(gamma), "bias": np.asarray(beta),
            "mean": np.asarray(mean), "var": np.asarray(var)}


class ConversionMap:
    """Declarative source→target tensor mapping for one model family.

    Usage: register (target_key, source_key, transform) triples, then
    ``convert`` a source tensor dict into a nested flax tree, reporting
    missing/unused tensors — the per-model tensor-level parity gate SURVEY
    §7 calls for.
    """

    def __init__(self, name: str):
        self.name = name
        self.rules: list[tuple[str, str, Optional[Callable]]] = []

    def map(self, target: str, source: str,
            transform: Optional[Callable] = None) -> "ConversionMap":
        self.rules.append((target, source, transform))
        return self

    def convert(self, source_tensors: Mapping[str, np.ndarray],
                *, strict: bool = True) -> Dict[str, Any]:
        flat: Dict[str, np.ndarray] = {}
        missing = []
        used = set()
        for target, source, transform in self.rules:
            if source not in source_tensors:
                missing.append(source)
                continue
            t = source_tensors[source]
            flat[target] = transform(t) if transform else np.asarray(t)
            used.add(source)
        if strict and missing:
            raise ModelLoadError("missing source tensors during conversion",
                                 model=self.name, missing=missing[:10],
                                 missing_count=len(missing))
        return unflatten_params(flat)

    def unused_sources(self, source_tensors: Mapping[str, np.ndarray]):
        used = {s for _, s, _ in self.rules}
        return sorted(set(source_tensors) - used)

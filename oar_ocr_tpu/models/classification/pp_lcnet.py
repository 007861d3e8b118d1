"""PP-LCNet image classifiers (doc orientation / textline orientation /
table wired-wireless).

Counterpart of the reference's PPLCNetModel (oar-ocr-core/src/models/
classification/pp_lcnet.rs:89-253), which serves three tasks:
- document orientation, 4 classes {0°, 90°, 180°, 270°} (preprocess.rs:111)
- textline orientation, 2 classes {0°, 180°} (ocr.rs:781-788)
- table classification, wired/wireless (table_analyzer.rs)

TPU-first: the classifier preprocess — resize_short 256 → center-crop
224×224 → ImageNet normalize (pp_lcnet.rs:40-55) — is an affine transform,
so it is folded into the same fused projective sampler as everything else
(ops/warp.sample_transform) and the whole classify step is one jitted
program returning (class, score) pairs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.warp import NormSpec, sample_transform
from ...runtime.runtime import Runtime, init_params
from ...utils.tracing import stage_timer
from ..backbones import PPLCNetV3
from ..layers import ACT


class PPLCNetClassifier(nn.Module):
    """LCNet trunk + 1280-wide head + softmax (deployed topology)."""

    num_classes: int
    scale: float = 1.0
    head_width: int = 1280

    @nn.compact
    def __call__(self, x):
        feat = PPLCNetV3(scale=self.scale, mode="cls")(x)   # (N, C)
        h = nn.Dense(self.head_width, dtype=feat.dtype)(feat)
        h = ACT["hswish"](h)
        logits = nn.Dense(self.num_classes, dtype=h.dtype)(h)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


@dataclass(frozen=True)
class ClassifierPreprocess:
    """resize_short + center-crop geometry (pp_lcnet.rs:40-55)."""

    resize_short: int = 256
    crop_h: int = 224
    crop_w: int = 224

    def matrix(self, src_h: int, src_w: int) -> np.ndarray:
        """Affine matrix: output crop px → source px (half-pixel resize
        convention composed with the center-crop offset)."""
        scale = self.resize_short / float(min(src_h, src_w))
        rh, rw = src_h * scale, src_w * scale
        off_x = (rw - self.crop_w) / 2.0
        off_y = (rh - self.crop_h) / 2.0
        inv = 1.0 / scale
        # src = ((crop + off) + 0.5) * inv - 0.5
        return np.array(
            [[inv, 0.0, (off_x + 0.5) * inv - 0.5],
             [0.0, inv, (off_y + 0.5) * inv - 0.5],
             [0.0, 0.0, 1.0]], np.float32)


@dataclass(frozen=True)
class DirectResizePreprocess:
    """Plain resize to (h, w) — textline orientation models use a fixed
    80×160 input rather than resize_short/crop."""

    h: int = 80
    w: int = 160

    @property
    def crop_h(self):
        return self.h

    @property
    def crop_w(self):
        return self.w

    def matrix(self, src_h: int, src_w: int) -> np.ndarray:
        from ...ops.warp import resize_matrix

        return resize_matrix(src_h, src_w, self.h, self.w)


class ImageClassifier:
    """Batched classifier over host images or pre-warped device tiles."""

    def __init__(self, params=None, *, num_classes: int, scale: float = 1.0,
                 preprocess=ClassifierPreprocess(),
                 runtime: Optional[Runtime] = None, name: str = "cls",
                 model_type: str = "pplcnet-v1"):
        self.runtime = runtime or Runtime.default()
        self.preprocess = preprocess
        self.name = name
        if model_type == "pplcnet-v1":
            # checkpoint-true PULC topology (pp_lcnet_exact.py); softmax
            # applied in _step_impl over its logits
            from .pp_lcnet_exact import PPLCNetV1Cls
            self.model = PPLCNetV1Cls(class_num=num_classes, scale=scale)
            self._returns_logits = True
        else:
            self.model = PPLCNetClassifier(num_classes=num_classes,
                                           scale=scale)
            self._returns_logits = False
        if params is None:
            params = init_params(
                self.model, (1, preprocess.crop_h, preprocess.crop_w, 3))
        self.params = self.runtime.put_params(params)
        # mesh mode: crop batch shards over ``data``, params + page store
        # replicated (plain jit when no mesh is active)
        self._step = self.runtime.shard_jit(self._step_impl,
                                            batch_argnums=(2, 3))

    def _run_step(self, pages_u8, mats: np.ndarray, idx: np.ndarray):
        """Pad the batch to shard evenly over the mesh, run, unpad."""
        n = mats.shape[0]
        mats, idx = self.runtime.pad_batch(mats, idx)
        cls, score = self._step(self.params, pages_u8, jnp.asarray(mats),
                                jnp.asarray(idx))
        return np.asarray(cls)[:n], np.asarray(score)[:n]

    def _step_impl(self, params, pages_u8, mats, img_idx):
        n = mats.shape[0]
        h, w = self.preprocess.crop_h, self.preprocess.crop_w
        full = jnp.full((n,), max(h, w), jnp.int32)
        x = sample_transform(
            pages_u8, mats, img_idx, full, full, out_h=h, out_w=w,
            norm=NormSpec.imagenet_rgb(),
            out_dtype=self.runtime.compute_dtype)
        probs = self.model.apply(params, x)          # (N, classes)
        if self._returns_logits:
            probs = jax.nn.softmax(probs.astype(jnp.float32), axis=-1)
        cls = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        score = jnp.max(probs, axis=-1)
        return cls, score

    def classify_pages(self, pages_u8: jax.Array,
                       shapes: Sequence[Tuple[int, int]],
                       page_indices: Optional[Sequence[int]] = None
                       ) -> List[Tuple[int, float]]:
        """Classify whole pages (doc orientation / table cls)."""
        n = len(shapes)
        mats = np.stack([self.preprocess.matrix(h, w) for h, w in shapes])
        idx = np.asarray(page_indices if page_indices is not None
                         else np.arange(n), np.int32)
        with stage_timer(f"{self.name}.device", batch=n):
            cls, score = self._run_step(pages_u8, mats, idx)
        return [(int(c), float(s)) for c, s in zip(cls, score)]

    def classify_quads(self, pages_u8: jax.Array,
                       quads: Sequence[Tuple[int, np.ndarray]]
                       ) -> List[Tuple[int, float]]:
        """Classify perspective regions (textline orientation on crops):
        compose the quad→crop homography with the classifier resize so the
        region never materializes at its native size."""
        from ...ops.warp import crop_geometry, resize_matrix

        import cv2

        mats, idxs = [], []
        for page_i, quad in quads:
            quad = np.asarray(quad, np.float32).reshape(4, 2)
            cw, ch, _ = crop_geometry(quad)
            pts_std = np.array([[0, 0], [cw, 0], [cw, ch], [0, ch]], np.float32)
            m1 = cv2.getPerspectiveTransform(pts_std, quad)
            m2 = self.preprocess.matrix(ch, cw).astype(np.float64)
            mats.append((m1 @ m2).astype(np.float32))
            idxs.append(page_i)
        if not mats:
            return []
        with stage_timer(f"{self.name}.device", batch=len(mats)):
            cls, score = self._run_step(pages_u8, np.stack(mats),
                                        np.asarray(idxs, np.int32))
        return [(int(c), float(s)) for c, s in zip(cls, score)]


def doc_orientation_classifier(params=None, runtime=None) -> ImageClassifier:
    """4-class page orientation (pp_lcnet.rs doc orientation)."""
    return ImageClassifier(params, num_classes=4, scale=1.0,
                           preprocess=ClassifierPreprocess(),
                           runtime=runtime, name="doc_ori")


def textline_orientation_classifier(params=None, runtime=None) -> ImageClassifier:
    """2-class text-line orientation, 80×160 input, scale 0.25."""
    return ImageClassifier(params, num_classes=2, scale=0.25,
                           preprocess=DirectResizePreprocess(80, 160),
                           runtime=runtime, name="line_ori")


def table_classifier(params=None, runtime=None) -> ImageClassifier:
    """2-class wired/wireless table classification."""
    return ImageClassifier(params, num_classes=2, scale=1.0,
                           preprocess=ClassifierPreprocess(),
                           runtime=runtime, name="table_cls")

"""DB detector wrapper: plan (host) → one XLA program (device) → geometry (host).

Counterpart of the reference's DBModel.forward (oar-ocr-core/src/models/
detection/db.rs:281 — preprocess → OrtInfer → DBPostProcess) re-split for
TPU: the resize + normalize + conv-net forward is ONE jitted program fed
raw uint8 pages (ops/warp.sample_transform fuses the preprocess), and only
contour geometry runs on host (processors/db_postprocess.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config.runtime import RuntimeConfig
from ...ops.resize import DetResizeConfig, det_target_size
from ...ops.warp import NormSpec, resize_matrix, sample_transform
from ...processors.db_postprocess import DBPostProcess, DBPostProcessConfig
from ...runtime.runtime import Runtime, init_params, stack_padded
from ...utils.tracing import stage_timer
from .db import DBNet


@dataclass
class DetPlan:
    """Host-computed plan for one image in a detection batch."""

    src_h: int
    src_w: int
    dst_h: int
    dst_w: int


class DBDetector:
    """Batched DB text detection over uint8 page images."""

    def __init__(
        self,
        params=None,
        *,
        resize_cfg: DetResizeConfig = DetResizeConfig(),
        post_cfg: DBPostProcessConfig = DBPostProcessConfig(),
        backbone_scale: float = 0.75,
        runtime: Optional[Runtime] = None,
        seed: int = 0,
    ):
        self.runtime = runtime or Runtime.default()
        self.resize_cfg = resize_cfg
        self.postprocess = DBPostProcess(post_cfg)
        self.model = DBNet(backbone_scale=backbone_scale)
        if params is None:
            params = init_params(self.model, (1, 64, 64, 3))
        self.params = jax.device_put(params, self.runtime.device)
        self._step = jax.jit(
            self._step_impl, static_argnames=("out_h", "out_w"))

    def _step_impl(self, params, pages_u8, mats, img_idx, valid_w, valid_h,
                   *, out_h: int, out_w: int):
        x = sample_transform(
            pages_u8, mats, img_idx, valid_w, valid_h,
            out_h=out_h, out_w=out_w, norm=NormSpec.imagenet_rgb(),
            out_dtype=self.runtime.compute_dtype)
        prob = self.model.apply(params, x)
        return prob.astype(jnp.float32)

    def plan(self, shapes: Sequence[Tuple[int, int]]) -> List[DetPlan]:
        """Compute per-image det resize targets (exact reference math)."""
        return [
            DetPlan(h, w, *det_target_size(h, w, self.resize_cfg))
            for (h, w) in shapes
        ]

    def detect(
        self,
        pages_u8: jax.Array,                 # (P, H, W, 3) uint8 on device
        shapes: Sequence[Tuple[int, int]],   # original (h, w) per page
        page_indices: Optional[Sequence[int]] = None,
    ) -> List[Tuple[List[np.ndarray], List[float]]]:
        """Detect text boxes on each page. Returns [(boxes, scores)] per page
        in original-image coordinates."""

        plans = self.plan(shapes)
        cfg = self.runtime.cfg
        n = len(plans)
        out_h = cfg.det_side_buckets.bucket(max(p.dst_h for p in plans))
        out_w = cfg.det_side_buckets.bucket(max(p.dst_w for p in plans))
        nb = cfg.det_batch_buckets.bucket(n)

        mats = np.zeros((nb, 3, 3), np.float32)
        mats[:, 0, 0] = mats[:, 1, 1] = mats[:, 2, 2] = 1.0
        valid_w = np.zeros((nb,), np.int32)
        valid_h = np.zeros((nb,), np.int32)
        img_idx = np.zeros((nb,), np.int32)
        for i, p in enumerate(plans):
            mats[i] = resize_matrix(p.src_h, p.src_w, p.dst_h, p.dst_w)
            valid_w[i] = p.dst_w
            valid_h[i] = p.dst_h
            img_idx[i] = page_indices[i] if page_indices is not None else i

        with stage_timer("det.device", batch=nb, hw=(out_h, out_w)):
            prob = self._step(
                self.params, pages_u8, jnp.asarray(mats),
                jnp.asarray(img_idx), jnp.asarray(valid_w),
                jnp.asarray(valid_h), out_h=out_h, out_w=out_w)
            prob = np.asarray(prob)

        results = []
        with stage_timer("det.postprocess", batch=n):
            for i, p in enumerate(plans):
                pred = prob[i, : p.dst_h, : p.dst_w]
                bitmap = (pred > self.postprocess.cfg.thresh).astype(np.uint8)
                if self.postprocess.cfg.use_dilation:
                    import cv2
                    bitmap = cv2.dilate(bitmap, np.ones((2, 2), np.uint8))
                boxes, scores = self.postprocess(pred, bitmap, p.src_w, p.src_h)
                results.append((boxes, scores))
        return results

    def detect_images(self, images: Sequence[np.ndarray]):
        """Convenience: host HWC uint8 RGB images → boxes."""
        shapes = [im.shape[:2] for im in images]
        cfg = self.runtime.cfg
        h = cfg.det_side_buckets.bucket(max(s[0] for s in shapes))
        w = cfg.det_side_buckets.bucket(max(s[1] for s in shapes))
        pages = self.runtime.put(stack_padded(list(images), (h, w)))
        return self.detect(pages, shapes)

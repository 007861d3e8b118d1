"""CTC recognizer wrapper: quads → warped tiles → probs → on-device decode.

Counterpart of CRNNModel.forward_refs (oar-ocr-core/src/models/recognition/
crnn.rs:234-258) + OCRResize (resize_recognition.rs:84-157) + CTC decode
(processors/decode.rs:452), restructured TPU-first: the perspective crop,
resize-to-48, pad-to-bucket, normalize, recognizer forward, and greedy CTC
argmax/dedup are ONE jitted program; the host supplies 3×3 matrices and
receives three (B, T) arrays to map through the dictionary.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.constants import REC_IMAGE_SHAPE, REC_MAX_WIDTH
from ...ops.ctc import CTCLabelDecoder, ctc_greedy_decode, default_charset
from ...ops.warp import build_rec_crop_matrix, warp_crops
from ...runtime.runtime import Runtime, init_params
from ...utils.tracing import stage_timer
from .svtr import SVTRRecognizer

REC_H = REC_IMAGE_SHAPE[1]  # 48


@dataclass
class CropPlan:
    """One text region scheduled for recognition."""

    page_index: int
    quad: np.ndarray          # (4,2) TL,TR,BR,BL in page coords
    width: int                # resized width at h=48 (post-rotation ratio)
    matrix: np.ndarray        # (3,3) tile px → page px
    rotated: bool

    @staticmethod
    def from_quad(page_index: int, quad: np.ndarray) -> "CropPlan":
        from ...ops.warp import crop_geometry

        cw, ch, rot = crop_geometry(quad)
        ew, eh = (ch, cw) if rot else (cw, ch)
        ratio = ew / float(eh)
        width = max(1, min(int(math.ceil(REC_H * ratio)), REC_MAX_WIDTH))
        mat, _ = build_rec_crop_matrix(quad, width, REC_H)
        return CropPlan(page_index, np.asarray(quad, np.float32), width, mat, rot)

    @property
    def wh_ratio(self) -> float:
        return self.width / float(REC_H)


class CTCRecognizer:
    """Batched text recognition over pre-planned crops."""

    def __init__(
        self,
        params=None,
        *,
        charset: Optional[Sequence[str]] = None,
        use_space_char: bool = True,
        backbone_scale: float = 0.95,
        runtime: Optional[Runtime] = None,
        seed: int = 0,
    ):
        self.runtime = runtime or Runtime.default()
        self.decoder = CTCLabelDecoder(charset or default_charset(),
                                       use_space_char=use_space_char)
        self.model = SVTRRecognizer(vocab_size=self.decoder.vocab_size,
                                    backbone_scale=backbone_scale)
        if params is None:
            params = init_params(self.model, (1, REC_H, 64, 3))
        self.params = jax.device_put(params, self.runtime.device)
        self._step = jax.jit(self._step_impl, static_argnames=("out_w",))

    def _step_impl(self, params, pages_u8, mats, img_idx, valid_w, *, out_w):
        tiles = warp_crops(pages_u8, mats, img_idx, valid_w,
                           out_h=REC_H, out_w=out_w,
                           out_dtype=self.runtime.compute_dtype)
        probs = self.model.apply(params, tiles)
        raw = ctc_greedy_decode(probs)
        return raw.indices, raw.probs, raw.keep

    def recognize_chunk(
        self, pages_u8: jax.Array, plans: Sequence[CropPlan]
    ) -> List[Tuple[str, float, List[int]]]:
        """Run one ratio-sorted chunk. Returns (text, confidence, kept
        column indices) per plan, in plan order."""

        if not plans:
            return []
        cfg = self.runtime.cfg
        n = len(plans)
        nb = cfg.rec_batch_buckets.bucket(n)
        out_w = cfg.rec_width_buckets.bucket(max(p.width for p in plans))

        mats = np.zeros((nb, 3, 3), np.float32)
        mats[:, 0, 0] = mats[:, 1, 1] = mats[:, 2, 2] = 1.0
        img_idx = np.zeros((nb,), np.int32)
        valid_w = np.zeros((nb,), np.int32)
        for i, p in enumerate(plans):
            mats[i] = p.matrix
            img_idx[i] = p.page_index
            valid_w[i] = min(p.width, out_w)

        with stage_timer("rec.device", batch=nb, width=out_w):
            idx, prob, keep = self._step(
                self.params, pages_u8, jnp.asarray(mats),
                jnp.asarray(img_idx), jnp.asarray(valid_w), out_w=out_w)
            idx, prob, keep = (np.asarray(idx), np.asarray(prob),
                               np.asarray(keep))

        with stage_timer("rec.decode", batch=n):
            decoded = self.decoder.decode_with_positions((idx[:n], prob[:n],
                                                          keep[:n]))
        return decoded

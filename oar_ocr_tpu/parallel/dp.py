"""Data-parallel full-pipeline step over a device mesh.

One jitted program running the complete device half of the OCR pipeline —
fused det preprocess → DBNet → (separately) crop warp → recognizer → CTC —
with the page/crop batch axes sharded over the mesh's ``data`` axis and
params replicated. XLA partitions every op along the batch dimension; the
only cross-device traffic is the crop gather when a crop's source page
lives on another shard (rare under page-aligned crop placement, which the
pipeline's chunking preserves).

This module is also the multi-chip dry-run surface (__graft_entry__.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ctc import ctc_greedy_decode
from ..ops.warp import NormSpec, sample_transform, warp_crops


def make_dp_ocr_step(det_model, rec_model, mesh: Mesh, *,
                     det_hw: Tuple[int, int], rec_w: int,
                     compute_dtype=jnp.bfloat16):
    """Build a jitted, mesh-sharded step running det+rec on one page batch.

    Inputs (sharded over ``data`` on the leading axis unless noted):
      pages_u8  (N, H, W, 3) uint8
      det_mats  (N, 3, 3), det_valid_w/h (N,)
      rec_mats  (M, 3, 3), rec_img_idx (M,), rec_valid_w (M,)
        — M crops reference pages by *global* index.
    Outputs: det prob map (N, det_h, det_w) f32; CTC (M, T) idx/prob/keep.
    """

    det_h, det_w = det_hw
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def step(det_params, rec_params, pages_u8, det_mats, det_valid_w,
             det_valid_h, rec_mats, rec_img_idx, rec_valid_w):
        idx = jnp.arange(pages_u8.shape[0], dtype=jnp.int32)
        x = sample_transform(
            pages_u8, det_mats, idx, det_valid_w, det_valid_h,
            out_h=det_h, out_w=det_w, norm=NormSpec.imagenet_rgb(),
            out_dtype=compute_dtype)
        prob = det_model.apply(det_params, x).astype(jnp.float32)

        tiles = warp_crops(pages_u8, rec_mats, rec_img_idx, rec_valid_w,
                           out_h=48, out_w=rec_w, out_dtype=compute_dtype)
        probs = rec_model.apply(rec_params, tiles)
        raw = ctc_greedy_decode(probs)
        return prob, raw.indices, raw.probs, raw.keep

    return jax.jit(
        step,
        in_shardings=(repl, repl, data, data, data, data, data, data, data),
        out_shardings=(data, data, data, data),
    )

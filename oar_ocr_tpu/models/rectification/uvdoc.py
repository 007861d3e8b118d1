"""UVDoc document rectification (unwarping).

Counterpart of the reference's UVDocModel (oar-ocr-core/src/models/
rectification/uvdoc.rs:39-213) + displacement-grid remap postprocess
(processors/uvdoc_postprocess.rs). The model predicts a coarse 2-D sampling
grid over the warped document; rectification bilinearly remaps the original
image through the (upsampled) grid.

TPU-first: model input resize, forward pass, grid upsample and the
full-resolution remap run as ONE jitted program per (input-bucket,
output-bucket) pair; the host supplies the page and receives the rectified
uint8 image.

Architecture: the published UVDoc/DDCP topology
(rectification/uvdoc_exact.py — 5×5 head, dilated-residual encoder to
stride 16, six dilated bridges, dual point heads; torch-mirror parity in
tests/test_uvdoc_parity.py). The legacy small UVDocNet remains for
tests/dev.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.grid_sample import grid_sample
from ...ops.warp import NormSpec, resize_matrix, sample_transform
from ...runtime.runtime import Runtime, init_params
from ...utils.tracing import stage_timer
from ..layers import ConvBNAct

# Reference UVDoc operating resolution (uvdoc.rs preprocess) and grid
# size — single source of truth in uvdoc_exact (the checkpoint topology).
from .uvdoc_exact import UVDOC_GRID_HW, UVDOC_INPUT_HW  # noqa: E402


class UVDocNet(nn.Module):
    """Conv encoder → normalized sampling grid (N, gh, gw, 2) in [-1, 1]."""

    grid_hw: Tuple[int, int] = UVDOC_GRID_HW
    width: int = 32

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = ConvBNAct(w, (3, 3), (2, 2), act="relu")(x)        # /2
        x = ConvBNAct(w * 2, (3, 3), (2, 2), act="relu")(x)    # /4
        x = ConvBNAct(w * 2, (3, 3), act="relu")(x)
        x = ConvBNAct(w * 4, (3, 3), (2, 2), act="relu")(x)    # /8
        x = ConvBNAct(w * 4, (3, 3), act="relu")(x)
        x = ConvBNAct(w * 8, (3, 3), (2, 2), act="relu")(x)    # /16
        x = ConvBNAct(w * 8, (3, 3), act="relu")(x)
        gh, gw = self.grid_hw
        x = jax.image.resize(x, (x.shape[0], gh, gw, x.shape[-1]),
                             method="bilinear")
        x = ConvBNAct(w * 4, (3, 3), act="relu")(x)
        grid = nn.Conv(2, (3, 3), padding="SAME", dtype=x.dtype)(x)
        return jnp.tanh(grid.astype(jnp.float32))              # [-1, 1]


class UVDocRectifier:
    """Page → rectified page, one jitted program."""

    def __init__(self, params=None, *, runtime: Optional[Runtime] = None,
                 model_type: str = "uvdoc-exact", num_filter: int = 32):
        from .uvdoc_exact import UVDocNetExact

        self.runtime = runtime or Runtime.default()
        self.model = (UVDocNetExact(num_filter=num_filter)
                      if model_type == "uvdoc-exact" else UVDocNet())
        if params is None:
            from ...runtime.runtime import init_params_fast

            params = init_params_fast(
                self.model, (1, UVDOC_INPUT_HW[0], UVDOC_INPUT_HW[1], 3))
        self.params = jax.device_put(params, self.runtime.device)
        self._step = jax.jit(self._step_impl, static_argnames=("out_h", "out_w"))

    def _step_impl(self, params, pages_u8, mats, img_idx, src_h, src_w,
                   *, out_h: int, out_w: int):
        ih, iw = UVDOC_INPUT_HW
        n = mats.shape[0]
        full = jnp.stack([jnp.full((n,), iw, jnp.int32),
                          jnp.full((n,), ih, jnp.int32)])
        x = sample_transform(
            pages_u8, mats, img_idx, full[0], full[1], out_h=ih, out_w=iw,
            norm=NormSpec(alpha=(1 / 255.0,) * 3, beta=(0.0,) * 3),
            out_dtype=self.runtime.compute_dtype)
        grid = self.model.apply(params, x)
        if isinstance(grid, tuple):
            grid = grid[0]            # exact net: (2-D grid, 3-D head)
        # Upsample the (gh, gw) grid so it spans exactly the PAGE extent
        # (h, w) inside the bucketed (out_h, out_w) buffer — align-corners
        # bilinear interp of the tiny grid at per-page dynamic scale
        # (a plain resize to the buffer would stretch the grid over the
        # padding and mis-scale every coordinate). Then [-1,1] → source
        # pixels (uvdoc_postprocess.rs remap convention).
        gh, gw = grid.shape[1:3]
        hf = jnp.maximum(src_h[:, None, None].astype(jnp.float32) - 1, 1)
        wf = jnp.maximum(src_w[:, None, None].astype(jnp.float32) - 1, 1)
        iy = jnp.arange(out_h, dtype=jnp.float32)[None, :, None]
        ix = jnp.arange(out_w, dtype=jnp.float32)[None, None, :]
        gcoords = jnp.stack(
            [jnp.broadcast_to(ix * ((gw - 1) / wf), (n, out_h, out_w)),
             jnp.broadcast_to(iy * ((gh - 1) / hf), (n, out_h, out_w))],
            axis=-1)
        up = grid_sample(grid, gcoords)                        # (n,oh,ow,2)
        unit = (up + 1.0) * 0.5                                # [0,1] units
        coords = jnp.stack([unit[..., 0] * wf, unit[..., 1] * hf], axis=-1)
        out = grid_sample(pages_u8.astype(jnp.float32), coords)
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    def rectify(self, image: np.ndarray) -> np.ndarray:
        """Rectify one HWC uint8 page; output has the same size."""
        h, w = image.shape[:2]
        cfg = self.runtime.cfg
        bh = cfg.det_side_buckets.bucket(h)
        bw = cfg.det_side_buckets.bucket(w)
        padded = np.zeros((1, bh, bw, 3), np.uint8)
        padded[0, :h, :w] = image
        mats = resize_matrix(h, w, *UVDOC_INPUT_HW)[None]
        with stage_timer("uvdoc.device", hw=(h, w)):
            out = self._step(
                self.params, jnp.asarray(padded), jnp.asarray(mats),
                jnp.zeros((1,), jnp.int32),
                jnp.asarray([h], jnp.int32), jnp.asarray([w], jnp.int32),
                out_h=bh, out_w=bw)
            out = np.asarray(out)[0, :h, :w]
        return out

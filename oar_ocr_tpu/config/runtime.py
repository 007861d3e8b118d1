"""Runtime configuration: device mesh, dtypes, bucketing, compilation.

TPU-native replacement for ``OrtSessionConfig`` + EP configuration
(reference: oar-ocr-core/src/core/config/onnx.rs:159-320 and
core/inference/ort_infer_config.rs:10-337). Where the reference picks
execution providers and thread counts, we pick a `jax.sharding.Mesh`, compute
dtype, and static-shape bucket tables (the core of the TPU dynamic-shape
strategy — see SURVEY §2.1 "Dynamic batching").
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import numpy as np

from .validation import Rule, validate_config


@dataclass(frozen=True)
class BucketTable:
    """Sorted static-shape buckets with recompile-on-miss semantics.

    Every distinct padded shape is one compiled executable; the table bounds
    the compile count while limiting padding waste. Replaces the reference's
    per-batch ad-hoc pad-to-max (core/batch/mod.rs:215-453) and
    ``AspectRatioBucketing`` (processors/aspect_ratio_bucketing.rs:15-147).
    """

    sizes: Tuple[int, ...]

    def __post_init__(self):
        object.__setattr__(self, "sizes", tuple(sorted(set(int(s) for s in self.sizes))))
        if not self.sizes:
            raise ValueError("BucketTable needs at least one size")

    def bucket(self, value: int) -> int:
        """Smallest bucket >= value; the largest bucket if none fits."""
        for s in self.sizes:
            if value <= s:
                return s
        return self.sizes[-1]

    def bucket_index(self, value: int) -> int:
        for i, s in enumerate(self.sizes):
            if value <= s:
                return i
        return len(self.sizes) - 1


def pow2_buckets(lo: int, hi: int) -> BucketTable:
    """Power-of-two buckets in [lo, hi] (decoder_graph.rs:14 KV buckets)."""
    sizes = []
    s = lo
    while s < hi:
        sizes.append(s)
        s *= 2
    sizes.append(hi)
    return BucketTable(tuple(sizes))


# Default bucket tables.
# Detector input sides: multiples of 32 spanning the default det presets
# (limit_side_len 960 / max_side 4000 — core/constants.rs:15,11). Coarse
# 320-px steps trade a little padding for few compiles.
# 704 catches the 4:3-page det target (1280x960 -> 960x704 after /32
# rounding) - without it DBNet pads to 960x960, +26% conv + transfer
DET_SIDE_BUCKETS = BucketTable((320, 640, 704, 960, 1280, 1600, 1920, 2560, 3200, 4000))
# Recognizer widths at h=48 (rec shape [3,48,320] constants.rs:21, cap 3200
# constants.rs:8). Derived from the reference bucketing defaults
# (aspect_ratio_bucketing.rs:40-77) extended to the 3200 cap.
REC_WIDTH_BUCKETS = BucketTable((160, 320, 480, 640, 960, 1280, 1920, 2560, 3200))
# Recognition batch buckets: pad batch to one of these so the rec graph
# compiles a handful of times (region_batch_size default 16/64).
REC_BATCH_BUCKETS = BucketTable((8, 16, 32, 64, 128))
DET_BATCH_BUCKETS = BucketTable((1, 2, 4, 8, 16))
# Native-resolution crop sampling tiles (two-stage rec preprocess).
REC_NATIVE_H_BUCKETS = BucketTable((32, 48, 96, 192))
REC_NATIVE_W_BUCKETS = BucketTable((160, 320, 640, 768, 960, 1280, 1920))


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. Replaces EP device-id selection
    (ort_infer_config.rs:101) with a named-axis mesh; the pipeline shards the
    page/crop batch axis over ``data`` (SURVEY §2.7 — DP over ICI is the
    primary v5e-8 strategy)."""

    axes: Tuple[str, ...] = ("data",)
    shape: Optional[Tuple[int, ...]] = None  # None → all local devices on axis 0
    # >1 → reserve a trailing ``model`` axis of this size for Megatron-style
    # tensor parallelism of the VLM decoders (parallel/tp.py); the remaining
    # devices form the ``data`` axis. OAR_TPU_TP env override.
    n_model: int = 1

    def build(self) -> jax.sharding.Mesh:
        devices = np.array(jax.devices())
        axes = self.axes
        if self.n_model > 1 and "model" not in axes:
            axes = axes + ("model",)
        shape = self.shape
        if shape is not None and len(shape) < len(axes):
            # an explicit shape was written against self.axes; carve the
            # appended model axis out of the leading (data) dimension
            if shape[0] % self.n_model:
                from ..errors import ConfigError

                raise ConfigError(
                    "n_model must divide the explicit mesh shape's "
                    "data dimension", n_model=self.n_model, shape=shape)
            shape = ((shape[0] // self.n_model,) + tuple(shape[1:])
                     + (self.n_model,))
        if shape is None:
            if self.n_model > 1:
                if len(devices) % self.n_model:
                    from ..errors import ConfigError

                    raise ConfigError(
                        "n_model must divide the device count",
                        n_model=self.n_model, devices=len(devices))
                shape = ((len(devices) // self.n_model,)
                         + (1,) * (len(axes) - 2) + (self.n_model,))
            else:
                shape = (len(devices),) + (1,) * (len(axes) - 1)
        return jax.sharding.Mesh(devices.reshape(shape), axes)


@dataclass(frozen=True)
class RuntimeConfig:
    """Top-level runtime knobs (the `OrtSessionConfig` analog)."""

    compute_dtype: str = "bfloat16"      # matmul/conv dtype on the MXU
    param_dtype: str = "float32"         # storage dtype of weights
    output_dtype: str = "float32"        # logits/prob maps returned to host
    donate_inputs: bool = True           # donate device buffers on dispatch
    det_side_buckets: BucketTable = DET_SIDE_BUCKETS
    rec_width_buckets: BucketTable = REC_WIDTH_BUCKETS
    rec_batch_buckets: BucketTable = REC_BATCH_BUCKETS
    det_batch_buckets: BucketTable = DET_BATCH_BUCKETS
    rec_native_h_buckets: BucketTable = REC_NATIVE_H_BUCKETS
    rec_native_w_buckets: BucketTable = REC_NATIVE_W_BUCKETS
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # Mesh policy: None → build a data-parallel mesh automatically when
    # more than one device is visible; True/False force it. With a mesh,
    # the pipelines shard every batch axis over ``data`` (params and page
    # batches replicated) — SURVEY §2.7's primary v5e-8 strategy, wired
    # into the production dispatch/collect paths.
    use_mesh: Optional[bool] = None
    # Kill switches (reference keeps per-feature env kill switches,
    # docs/environment-variables.md:5-30; here they are config fields with
    # env overrides applied by `from_env`).
    enable_pallas_kernels: bool = True
    enable_async_dispatch: bool = True
    # Sparse det-bitmap fetch on degraded d2h links: ship the per-row
    # occupancy mask (~0.1% of the bytes), gather only occupied rows,
    # reassemble bit-exactly on host; overflow falls back to the full
    # fetch. "auto" activates when the measured d2h bandwidth EMA drops
    # below det_sparse_bw_mbps (the tunnel swings 1.2 GB/s → 3 MB/s,
    # docs/environment-variables.md); "on"/"off" force it.
    det_sparse_fetch: str = "auto"
    det_sparse_bw_mbps: float = 20.0
    # Sparse page UPLOAD on degraded h2d links (runtime/page_upload.py):
    # grayscale-collapse and/or ship only non-constant 32x32 tiles,
    # rebuilt bit-exactly on device. "auto" activates below the measured
    # h2d bandwidth EMA threshold; "on"/"off" force it.
    page_upload: str = "auto"
    upload_sparse_bw_mbps: float = 150.0
    # Kept-only rec CTC fetch on degraded d2h links (ops/ctc.py
    # gather_kept_ctc): ship only the kept timesteps (count + columns +
    # 6-byte entries) at a speculative budget instead of all T timesteps;
    # overflow refetches the full packed array. Decode-lossless: the
    # dictionary decoder only ever reads kept columns.
    rec_kept_fetch: str = "auto"
    # Link-recovery re-measurement cadence for the adaptive transfer
    # paths: while sparse transfers are active, at most ONE full-price
    # dense/full transfer per this many seconds re-measures the link
    # (runtime.h2d_recovery_due / d2h_recovery_due). Time-based, not
    # count-based: the r4 every-16th-call pattern fired a 59 MB dense
    # upload every ~6 s of pipelined bench time and cost ~40% of the
    # degraded-link headline.
    link_recovery_interval_s: float = 60.0

    RULES = {
        "compute_dtype": Rule(choices=("bfloat16", "float32")),
        "param_dtype": Rule(choices=("bfloat16", "float32")),
        "output_dtype": Rule(choices=("bfloat16", "float32")),
        "det_sparse_fetch": Rule(choices=("auto", "on", "off")),
        "rec_kept_fetch": Rule(choices=("auto", "on", "off")),
        "page_upload": Rule(choices=("auto", "on", "off")),
    }

    def validate(self) -> None:
        validate_config(self)

    @staticmethod
    def from_env(base: "RuntimeConfig" | None = None) -> "RuntimeConfig":
        import os

        cfg = base or RuntimeConfig()
        updates = {}
        if os.environ.get("OAR_TPU_DISABLE_PALLAS"):
            updates["enable_pallas_kernels"] = False
        if os.environ.get("OAR_TPU_DTYPE"):
            updates["compute_dtype"] = os.environ["OAR_TPU_DTYPE"]
        if os.environ.get("OAR_TPU_MESH") is not None:
            updates["use_mesh"] = os.environ["OAR_TPU_MESH"] not in ("0", "")
        if os.environ.get("OAR_TPU_SPARSE_DET"):
            updates["det_sparse_fetch"] = os.environ["OAR_TPU_SPARSE_DET"]
        if os.environ.get("OAR_TPU_KEPT_REC"):
            updates["rec_kept_fetch"] = os.environ["OAR_TPU_KEPT_REC"]
        if os.environ.get("OAR_TPU_SPARSE_UPLOAD"):
            updates["page_upload"] = os.environ["OAR_TPU_SPARSE_UPLOAD"]
        if os.environ.get("OAR_TPU_RECOVERY_S"):
            updates["link_recovery_interval_s"] = float(
                os.environ["OAR_TPU_RECOVERY_S"])
        if os.environ.get("OAR_TPU_TP"):
            updates["mesh"] = dataclasses.replace(
                cfg.mesh, n_model=int(os.environ["OAR_TPU_TP"]))
        return dataclasses.replace(cfg, **updates) if updates else cfg


@dataclass(frozen=True)
class ParallelPolicy:
    """Host-side parallelism thresholds (core/config/parallel.rs:11-27).

    The reference gates rayon by element counts; we gate the host thread pool
    used for image decode / geometry the same way.
    """

    min_elements: int = 1 << 20  # ~1 MiB of pixels before threading
    max_workers: int = 8

    RULES = {
        "min_elements": Rule(min=0),
        "max_workers": Rule(min=1, max=256),
    }

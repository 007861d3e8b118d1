"""Model runtime: params on device + jitted executables per shape bucket.

TPU-native replacement for the reference's ``OrtInfer`` engine
(oar-ocr-core/src/core/inference/mod.rs:31, ort_infer_execution.rs:121-305).
The mapping:

- ONNX ``Session``            → a flax module + converted params on device
- session pool (``Vec<Mutex<Session>>``, round-robin)
                              → jax's executable cache: one compiled XLA
                                program per (function, bucketed shape);
                                dispatch is async and reentrant, so no pool
                                or locks are needed
- ``infer_first_output_f32`` zero-copy
                              → outputs stay on device; only decode-reduced
                                arrays are fetched (ops/ctc.py)
- EP configuration            → RuntimeConfig (dtype, mesh, buckets)

``ModelRuntime`` wraps one model: it owns the params, casts inputs to the
compute dtype, and exposes ``apply`` whose jit cache is keyed by the padded
bucket shapes the callers feed it.
"""

from __future__ import annotations

import os
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.runtime import RuntimeConfig
from ..errors import InferenceError
from ..utils.tracing import stage_timer


_CACHE_ENABLED = False


def _enable_compilation_cache() -> None:
    """Persist compiled executables across processes (the warm-start analog
    of the reference's cuDNN-algo caching note, docs/FAQ.md:30 — first-call
    penalty). Safe to call repeatedly; disabled via OAR_TPU_NO_COMPILE_CACHE."""

    global _CACHE_ENABLED
    if _CACHE_ENABLED or os.environ.get("OAR_TPU_NO_COMPILE_CACHE"):
        return
    cache_dir = os.environ.get(
        "OAR_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".oar_ocr_tpu", "xla_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_ENABLED = True
    except Exception:  # pragma: no cover - cache is best-effort
        pass


class Runtime:
    """Process-wide device context (devices, dtype policy, upload helpers)."""

    _default: Optional["Runtime"] = None
    _lock = threading.Lock()

    def __init__(self, cfg: Optional[RuntimeConfig] = None):
        self.cfg = RuntimeConfig.from_env(cfg)
        self.cfg.validate()
        self.devices = jax.devices()
        self.device = self.devices[0]
        # Data-parallel mesh (SURVEY §2.7): built automatically when more
        # than one device is visible (or forced via use_mesh/OAR_TPU_MESH).
        # Pipelines shard batch axes over ``data``; params and page
        # uploads are replicated, so per-sample math is shard-invariant.
        want = self.cfg.use_mesh
        if want is None:
            # auto-on for real multi-chip accelerators only; virtual CPU
            # device counts (tests/dryrun) must opt in via use_mesh=True
            want = (len(self.devices) > 1
                    and self.device.platform in ("tpu", "axon"))
        self.mesh = self.cfg.mesh.build() if want else None
        self.n_data = int(self.mesh.shape["data"]) if self.mesh else 1
        self.n_model = (int(self.mesh.shape.get("model", 1))
                        if self.mesh else 1)
        # persistent cache only for real accelerators: XLA:CPU AOT results
        # are machine-feature-pinned and can SIGILL across detection drift
        if self.device.platform in ("tpu", "axon"):
            _enable_compilation_cache()
        # d2h bandwidth EMA (MB/s), fed by the big fetch sites — drives
        # the auto sparse det-bitmap fetch (config det_sparse_fetch)
        self._d2h_mbps: Optional[float] = None
        self._d2h_rtt: Optional[float] = None
        # h2d bandwidth EMA (MB/s), fed opportunistically by page uploads
        # — drives the auto sparse page upload (config page_upload)
        self._h2d_mbps: Optional[float] = None
        self._h2d_t: float = 0.0
        # free h2d bandwidth observation (runtime/page_upload.py →
        # h2d_checkpoint): (payload, t0) of the first sizable upload in
        # the current predict window. NO dedicated completion fetch is
        # ever issued — a blocking probe cost ~835 ms per stale interval
        # on a degraded tunnel (the r3 BENCH first-iteration cliff,
        # measured); instead the window to the first DEPENDENT d2h fetch
        # (which predict pays anyway) bounds the bandwidth.
        self._h2d_obs = None
        # link-recovery probe clocks (h2d_recovery_due / d2h_recovery_due):
        # last dense page upload, and last time a REAL d2h bandwidth
        # measurement landed in note_d2h. Seeded to construction time so
        # a fresh runtime never probes before the first interval elapses.
        import time as _time

        _now = _time.monotonic()
        self._h2d_dense_t = _now
        self._d2h_meas_t = _now
        # per-process transfer accounting (bench's link-floor model)
        self.d2h_bytes_total = 0
        self.d2h_fetch_count = 0
        self.h2d_bytes_total = 0
        self.h2d_put_count = 0
        # adaptive-path health accounting (bench flake itemization):
        # degrade_counts — unplanned full-transfer fallbacks (tunnel
        # flakes, compile drops); recovery_counts — SCHEDULED periodic
        # dense/full transfers that re-measure the link (time-based,
        # h2d_recovery_due/d2h_recovery_due — expected, not a failure);
        # link_retry_count — io_submit transient-read retries.
        self.degrade_counts: dict = {}
        self.recovery_counts: dict = {}
        # overflow_counts — EXPECTED, self-correcting speculative-budget
        # misses (e.g. kept-CTC k-budget exceeded → one extra full RTT,
        # history widens); neither a failure nor a scheduled probe.
        self.overflow_counts: dict = {}
        self.link_retry_count = 0
        # single-worker link executor: all d2h fetches are submitted here
        # so the (GIL-releasing) tunnel waits overlap main-thread host CPU
        # work (contours, upload analysis, crop planning). One worker
        # keeps transfer order deterministic and matches the serial link.
        self._io = None
        # link keepalive: the remote tunnel drops its session after idle
        # and the first post-idle transfer pays a multi-second reconnect
        # (measured: 10.4 s for a small upload after 50 s idle). A tiny
        # background ping every few seconds keeps the session warm.
        self._last_activity = 0.0
        if (self.device.platform in ("tpu", "axon")
                and not os.environ.get("OAR_TPU_NO_KEEPALIVE")):
            self._start_keepalive()

    # substrings identifying TRANSIENT tunnel read errors (observed
    # wire-level flake messages); anything else is deterministic (shape
    # bug, OOM) and must surface immediately instead of re-running the
    # whole fetch and demoting the first occurrence to a warning
    _TRANSIENT_ERR_SIGNATURES = (
        "response body closed", "read body", "connection reset",
        "broken pipe", "timed out", "timeout", "unavailable",
        "unexpected eof",
    )

    @classmethod
    def _is_transient_link_error(cls, exc: BaseException) -> bool:
        msg = str(exc).lower()
        return any(s in msg for s in cls._TRANSIENT_ERR_SIGNATURES)

    def io_submit(self, fn, *args, **kwargs):
        """Run ``fn`` on the link thread; returns a ``Future``. Use for
        every blocking device→host fetch so the transfer (which releases
        the GIL) overlaps main-thread host work. A fetch that dies on a
        TRANSIENT tunnel read error (known wire-flake signatures) is
        retried once — the device array is still alive, so a second read
        is valid; deterministic errors and second failures surface at
        ``Future.result()`` — callers keep their fallback ladders."""
        ex = self._io
        if ex is None:
            from concurrent.futures import ThreadPoolExecutor

            ex = ThreadPoolExecutor(max_workers=1,
                                    thread_name_prefix="oar-link")
            self._io = ex

        def run_with_retry():
            try:
                return fn(*args, **kwargs)
            except Exception as e:
                if not self._is_transient_link_error(e):
                    raise
                import logging
                import time as _time

                logging.getLogger(__name__).warning(
                    "link-thread fetch failed (%s); retrying once", e)
                self.link_retry_count += 1
                _time.sleep(0.05)
                return fn(*args, **kwargs)

        return ex.submit(run_with_retry)

    def note_degrade(self, path: str) -> None:
        """Count one UNPLANNED adaptive-path degradation (a tunnel flake
        or compile drop forced a full transfer)."""
        self.degrade_counts[path] = self.degrade_counts.get(path, 0) + 1

    def note_recovery(self, path: str) -> None:
        """Count one SCHEDULED full/dense transfer (periodic link
        re-measurement while an adaptive path is active)."""
        self.recovery_counts[path] = self.recovery_counts.get(path, 0) + 1

    def note_overflow(self, path: str) -> None:
        """Count one EXPECTED speculative-budget overflow (refetch + budget
        raise — self-correcting, not a degradation)."""
        self.overflow_counts[path] = self.overflow_counts.get(path, 0) + 1

    KEEPALIVE_IDLE_S = 8.0

    def touch(self) -> None:
        """Record link activity (transfers refresh the keepalive clock)."""
        import time as _time

        self._last_activity = _time.monotonic()

    def _start_keepalive(self) -> None:
        def ping_loop():
            import time as _time

            payload = np.zeros((8,), np.uint8)
            while True:
                _time.sleep(self.KEEPALIVE_IDLE_S / 2)
                if (_time.monotonic() - self._last_activity
                        < self.KEEPALIVE_IDLE_S):
                    continue
                try:
                    dev = jax.device_put(payload, self.device)
                    np.asarray(jax.device_get(dev))
                except Exception:       # pragma: no cover - device gone
                    return
                self.touch()

        t = threading.Thread(target=ping_loop, daemon=True,
                             name="oar-link-keepalive")
        t.start()

    def note_rtt(self, seconds: float) -> None:
        """Record a tiny-fetch round-trip (payload ≈ 0) so bandwidth
        estimates can subtract the fixed link latency."""
        self.touch()
        self.d2h_fetch_count += 1
        if seconds <= 0:
            return
        self._d2h_rtt = (seconds if self._d2h_rtt is None
                         else 0.7 * self._d2h_rtt + 0.3 * seconds)

    def note_d2h(self, nbytes: int, seconds: float) -> None:
        """Record one device→host transfer for the bandwidth estimate.
        Small transfers are RTT-dominated and skipped; the RTT EMA is
        subtracted so payload bandwidth is measured, not latency."""
        self.touch()
        self.d2h_bytes_total += nbytes
        self.d2h_fetch_count += 1
        if nbytes < 64 * 1024 or seconds <= 0:
            return
        # bound the RTT subtraction: when the whole fetch is
        # RTT-dominated, (seconds - rtt) → ~0 and the division produced
        # absurd multi-GB/s readings that kept the sparse det fetch OFF
        # on degraded links (r4 diag: EMA 9216 MB/s while the real link
        # moved ~10 MB/s). Attribute at most 3/4 of the time to latency.
        payload_s = max(seconds - (self._d2h_rtt or 0.0), 0.25 * seconds)
        mbps = nbytes / payload_s / 1e6
        self._d2h_mbps = (mbps if self._d2h_mbps is None
                          else 0.7 * self._d2h_mbps + 0.3 * mbps)
        import time as _time

        self._d2h_meas_t = _time.monotonic()

    @property
    def d2h_mbps(self) -> Optional[float]:
        return self._d2h_mbps

    def note_h2d(self, nbytes: int, seconds: float) -> None:
        """Record one host→device transfer (measured to completion) for
        the upload-bandwidth estimate; the d2h RTT EMA is subtracted since
        forcing completion costs one round trip."""
        import time as _time

        if nbytes < 64 * 1024 or seconds <= 0:
            return
        # same bounded RTT subtraction as note_d2h
        payload_s = max(seconds - (self._d2h_rtt or 0.0), 0.25 * seconds)
        mbps = nbytes / payload_s / 1e6
        self._h2d_mbps = (mbps if self._h2d_mbps is None
                          else 0.7 * self._h2d_mbps + 0.3 * mbps)
        self._h2d_t = _time.monotonic()

    @property
    def h2d_mbps(self) -> Optional[float]:
        return self._h2d_mbps

    def h2d_stale(self, interval_s: float) -> bool:
        """True when the h2d EMA should be refreshed (never measured, or
        older than ``interval_s``)."""
        import time as _time

        return (self._h2d_mbps is None
                or _time.monotonic() - self._h2d_t > interval_s)

    def note_upload_start(self, payload: int, t0: float) -> None:
        """Register the FIRST sizable upload of the current predict
        window for free bandwidth observation (h2d_checkpoint)."""
        if self._h2d_obs is None and payload >= 4 * 1024 * 1024:
            self._h2d_obs = (payload, t0)

    def h2d_checkpoint(self) -> None:
        """Feed the h2d bandwidth estimate from work predict pays anyway.

        Called by the pipelines right after the first d2h fetch that
        DEPENDS on the registered upload returns (the det bitmap fetch of
        batch 0 depends on page chunk 0). The elapsed window bounds the
        upload duration from above, so payload/elapsed LOWER-bounds the
        bandwidth:
        - big payload + long window (≥8 MB, >0.5 s): the upload dominated
          the window — treat as a real measurement (can lower the EMA,
          the degraded-link switch);
        - otherwise: upward-only (can only raise the EMA — a loose bound
          must not drag a healthy estimate down).
        No fetch is ever issued for measurement (the r3 cliff fix); link
        recovery while sparse is detected by the periodic dense upload
        (runtime/page_upload.py, h2d_recovery_due — time-based)."""
        obs = self._h2d_obs
        if obs is None:
            return
        self._h2d_obs = None
        payload, t0 = obs
        import time as _time

        elapsed = _time.perf_counter() - t0
        if elapsed <= 0:
            return
        bound = payload / elapsed / 1e6
        if payload >= 8 * 1024 * 1024 and elapsed > 0.5:
            self.note_h2d(payload, elapsed)
        elif self._h2d_mbps is None or bound > self._h2d_mbps:
            self.note_h2d(payload, elapsed)
        else:
            self._h2d_t = _time.monotonic()   # link observed; not stale

    def h2d_recovery_due(self) -> bool:
        """True when the sparse page upload should ship ONE dense batch
        to re-measure the link (runtime/page_upload.py). Time-based: the
        free checkpoint observations are windowed lower bounds (the
        window includes det compute) that cannot reliably cross the
        recovery threshold, so at most one full-price dense upload per
        ``link_recovery_interval_s`` re-measures for real. The r4
        every-16th COUNT pattern fired a 59 MB dense upload every ~6 s
        of pipelined bench time — two landed inside one 8-iteration
        window and took the degraded-link headline from ~40 to 19.3
        pages/s (BENCH r5 first run)."""
        import time as _time

        return (_time.monotonic() - self._h2d_dense_t
                > self.cfg.link_recovery_interval_s)

    def note_dense_upload(self) -> None:
        """Record a dense page upload (its checkpoint observation is a
        real link measurement) so the recovery probe clock resets."""
        import time as _time

        self._h2d_dense_t = _time.monotonic()

    def d2h_recovery_due(self) -> bool:
        """True when the sparse det fetch should ship ONE full bitmap to
        re-measure the link — only when the d2h EMA is STARVED (no
        ≥64 KB fetch has landed a note_d2h measurement within
        ``link_recovery_interval_s``). Sparse payloads above the floor
        keep the EMA live for free: a recovered link reads high on the
        next sparse fetch and auto mode disengages without any probe.
        Callers MUST pair a fired probe with :meth:`note_d2h_probe` —
        a probe whose full transfer is still under note_d2h's 64 KB
        floor would otherwise leave the clock stale and fire on every
        batch."""
        import time as _time

        return (_time.monotonic() - self._d2h_meas_t
                > self.cfg.link_recovery_interval_s)

    def note_d2h_probe(self) -> None:
        """Reset the d2h probe clock when a scheduled full-transfer
        probe is ISSUED (not merely measured): small det buckets pack
        under the 64 KB measurement floor, and without this reset the
        at-most-one-per-interval probe degenerates into a full fetch
        on every batch."""
        import time as _time

        self._d2h_meas_t = _time.monotonic()

    def put_pages(self, images, target_hw) -> jax.Array:
        """Upload variable-size HWC uint8 pages as one padded
        (B, H, W, 3) batch; on a slow h2d link the transfer is
        grayscale-collapsed and/or tile-sparse, reconstructed bit-exactly
        on device (runtime/page_upload.py)."""
        from .page_upload import upload_pages

        return upload_pages(self, images, target_hw)

    def det_sparse_active(self) -> bool:
        """Sparse det-bitmap fetch policy (config det_sparse_fetch):
        forced on/off, or auto below the bandwidth threshold. Works
        under a mesh too (VERDICT r4 item 4): the gather programs are
        batch-parallel (per-row top_k + take_along_axis), so GSPMD
        partitions them over ``data`` and the host fetches the (much
        smaller) sharded payload — dryrun_multichip asserts mesh==single
        identity with the path forced on."""
        mode = self.cfg.det_sparse_fetch
        if mode == "off":
            return False
        if mode == "on":
            return True
        return (self._d2h_mbps is not None
                and self._d2h_mbps < self.cfg.det_sparse_bw_mbps)

    def rec_kept_active(self) -> bool:
        """Kept-only rec CTC fetch policy (config rec_kept_fetch): forced
        on/off, or auto below the same bandwidth threshold as the sparse
        det fetch. Mesh-compatible for the same reason as
        :meth:`det_sparse_active` (gather_kept_ctc is batch-parallel;
        the kept-mode concat/pad is the same eager sharded-array code
        the full merge already runs under a mesh)."""
        mode = self.cfg.rec_kept_fetch
        if mode == "off":
            return False
        if mode == "on":
            return True
        return (self._d2h_mbps is not None
                and self._d2h_mbps < self.cfg.det_sparse_bw_mbps)

    @classmethod
    def default(cls) -> "Runtime":
        with cls._lock:
            if cls._default is None:
                cls._default = Runtime()
            return cls._default

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    def put(self, array: np.ndarray) -> jax.Array:
        """Upload a host array: replicated across the mesh when one is
        active (page batches are broadcast once; all per-crop gathers then
        stay shard-local), else to the primary device."""
        if self.mesh is not None:
            return jax.device_put(array, self.replicated_sharding())
        return jax.device_put(array, self.device)

    # --- mesh helpers (no-ops without a mesh) -------------------------
    def data_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P("data"))

    def replicated_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P())

    def put_params(self, tree):
        """Place a params pytree: replicated over the mesh if active."""
        if self.mesh is not None:
            sh = self.replicated_sharding()
            return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
        return jax.device_put(tree, self.device)

    def put_params_vl(self, tree):
        """Place a VL decoder params pytree: Megatron-style tensor-parallel
        over the ``model`` axis when one is active (parallel/tp.py rules —
        column-sharded q/k/v + gate/up + lm_head, row-sharded o/down, GSPMD
        inserting the all-reduces), otherwise `put_params` semantics.
        Inputs need no special placement: uncommitted host arrays compose
        with committed TP params under plain `jit`."""
        if self.mesh is not None and self.n_model > 1:
            from ..parallel.tp import partition_params

            return partition_params(tree, self.mesh)
        return self.put_params(tree)

    def round_batch(self, nb: int) -> int:
        """Round a batch bucket up to a multiple of the data-axis size so
        the leading axis shards evenly."""
        n = self.n_data
        return nb if nb % n == 0 else ((nb + n - 1) // n) * n

    def pad_batch(self, *arrays):
        """Pad every array's leading axis to ``round_batch`` size by
        repeating row 0 (identity without a mesh). Returns the padded
        arrays; slice device outputs back with the original length."""
        import numpy as _np

        n = arrays[0].shape[0]
        nb = self.round_batch(n)
        if nb == n:
            return arrays
        pad = nb - n
        return tuple(_np.concatenate([a, _np.repeat(a[:1], pad, axis=0)])
                     for a in arrays)

    def shard_jit(self, fn, batch_argnums, *, static_argnames=(),
                  out_spec="data"):
        """jit ``fn`` with the positional args in ``batch_argnums`` sharded
        over ``data`` and the rest replicated; plain jit when no mesh is
        active. Static args must be passed as KEYWORDS at the call site
        (pjit forbids kwargs alongside in_shardings, so each distinct
        static combination is bound into a cached partial).

        ``out_spec``: "data" | "replicated" | a tuple of those matching the
        output structure."""
        if self.mesh is None:
            return jax.jit(fn, static_argnames=static_argnames)
        import functools as _ft
        import inspect

        data = self.data_sharding()
        repl = self.replicated_sharding()
        sig = inspect.signature(fn)
        n_pos = sum(
            1 for p in sig.parameters.values()
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD))
        in_sh = tuple(data if i in batch_argnums else repl
                      for i in range(n_pos))

        def resolve(s):
            return data if s == "data" else repl

        out_sh = (tuple(resolve(s) for s in out_spec)
                  if isinstance(out_spec, tuple) else resolve(out_spec))
        cache = {}

        def call(*args, **statics):
            key = tuple(sorted(statics.items()))
            jitted = cache.get(key)
            if jitted is None:
                jitted = jax.jit(_ft.partial(fn, **statics),
                                 in_shardings=in_sh, out_shardings=out_sh)
                cache[key] = jitted
            return jitted(*args)

        return call


class ModelRuntime:
    """One model's params + jitted apply (the per-model `Session` analog)."""

    def __init__(self, module, params, *, runtime: Optional[Runtime] = None,
                 name: str = "model"):
        self.module = module
        self.runtime = runtime or Runtime.default()
        self.name = name
        self.params = self.runtime.put_params(params)
        self._apply = jax.jit(self._apply_impl)

    def _apply_impl(self, params, x):
        return self.module.apply(params, x)

    def apply(self, x: jax.Array) -> jax.Array:
        """Run the model; jit compiles once per input bucket shape."""
        with stage_timer(f"{self.name}.apply", shape=tuple(x.shape)):
            try:
                return self._apply(self.params, x)
            except Exception as e:  # pragma: no cover - device failure path
                raise InferenceError(
                    "model execution failed", model=self.name,
                    input_shape=tuple(x.shape)) from e

    def init_random(self, rng_seed: int, example: np.ndarray):
        """Development-mode random init (no converted weights available)."""
        rng = jax.random.PRNGKey(rng_seed)
        return self.module.init(rng, jnp.asarray(example))


def init_params(module, example_shape, *, seed: int = 0, dtype=jnp.float32):
    """Initialize a flax module's params for an example input shape.

    Runs on the CPU backend: eager `module.init` dispatches dozens of
    tiny one-op programs, and on the remote-compile TPU tunnel each cold
    op costs minutes (docs/environment-variables.md). XLA's RNG is
    bit-deterministic across backends, so the values are identical; the
    tree is transferred when the caller places it (put_params)."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:                     # no CPU backend registered
        cpu = None
    if cpu is None:
        rng = jax.random.PRNGKey(seed)
        return module.init(rng, jnp.zeros(example_shape, dtype))
    # XLA:CPU AOT cache entries are machine-feature-pinned (SIGILL risk
    # across hosts — CLAUDE.md); keep the persistent cache, enabled for
    # the TPU programs, away from these throwaway CPU compiles
    prev_cache = jax.config.jax_compilation_cache_dir
    try:
        if prev_cache:
            jax.config.update("jax_compilation_cache_dir", None)
        with jax.default_device(cpu):
            rng = jax.random.PRNGKey(seed)
            x = jnp.zeros(example_shape, dtype)
            return module.init(rng, x)
    finally:
        if prev_cache:
            jax.config.update("jax_compilation_cache_dir", prev_cache)


def materialize_shapes(shapes, *, seed: int = 0, scale: float = 0.05):
    """Materialize a jax.eval_shape'd param pytree as seeded HOST randoms
    (no device compute): BN variance > 0, norm scales 1, biases/means 0,
    everything else small normals. Shared by :func:`init_params_fast`
    and the VLM fast-init paths (vl/exact_models.py, vl/model.py) —
    full-size random weights without running flax's eager init, which
    would dispatch dozens of tiny programs per layer through the
    remote-compile tunnel."""
    gen = np.random.default_rng(seed)

    def leaf(path, s):
        name = str(getattr(path[-1], "key", "")) if path else ""
        if s.dtype == jnp.int32:
            return np.zeros(s.shape, np.int32)
        if name == "var":                      # BN variance must be > 0
            v = gen.random(s.shape).astype(np.float32) * 0.5 + 0.75
        elif name in ("scale", "bias", "mean"):
            v = (np.ones(s.shape, np.float32) if name == "scale"
                 else np.zeros(s.shape, np.float32))
        else:
            v = gen.standard_normal(s.shape).astype(np.float32) * scale
        # HOST arrays: leaves stay off-device until the caller places the
        # tree (put_params) — jnp.asarray here would device_put every
        # leaf to the default device and double the tunnel transfer
        return v.astype(s.dtype) if v.dtype != s.dtype else v

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def init_params_fast_fn(init_fn, *, seed: int = 0, scale: float = 0.05):
    """Shape-only init for an arbitrary flax init CLOSURE
    ``init_fn(rng) -> params``: eval_shape it (zero compute, any
    backend) and materialize the leaves on host. The multi-argument
    analog of :func:`init_params_fast` for the VLM modules' init_all
    signatures."""
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(seed))
    return materialize_shapes(shapes, seed=seed, scale=scale)


def init_params_fast(module, example_shape, *, seed: int = 0,
                     dtype=jnp.float32, scale: float = 0.05):
    """Shape-only init: trace the module with jax.eval_shape (no compute)
    and materialize every leaf as seeded host randoms. For big models
    (RT-DETR-L is ~42 M params) a real ``init`` runs the whole forward
    eagerly — minutes on the single host core — while the weights are
    random placeholders anyway (real values come from convert_weights)."""
    rng = jax.random.PRNGKey(seed)
    shapes = jax.eval_shape(lambda r: module.init(r, jnp.zeros(
        tuple(example_shape), dtype)), rng)
    return materialize_shapes(shapes, seed=seed, scale=scale)


def pad_to(arr: np.ndarray, shape: Tuple[int, ...], value=0) -> np.ndarray:
    """Zero-pad a host array up to ``shape`` (no-op when equal)."""
    if tuple(arr.shape) == tuple(shape):
        return arr
    pads = [(0, t - s) for s, t in zip(arr.shape, shape)]
    if any(p[1] < 0 for p in pads):
        from ..errors import ProcessingError

        raise ProcessingError.tensor_operation(
            "cannot pad array to a smaller target", shape=arr.shape,
            target=tuple(shape))
    return np.pad(arr, pads, constant_values=value)


def stack_padded(images, target_hw: Tuple[int, int]) -> np.ndarray:
    """Stack variable-size HWC uint8 images into (N, H, W, C) zero-padded."""
    n = len(images)
    h, w = target_hw
    c = images[0].shape[2] if images[0].ndim == 3 else 1
    out = np.zeros((n, h, w, c), dtype=np.uint8)
    for i, img in enumerate(images):
        ih, iw = img.shape[:2]
        out[i, :ih, :iw] = img if img.ndim == 3 else img[..., None]
    return out

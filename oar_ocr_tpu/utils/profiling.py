"""Profiler integration: jax.profiler traces around pipeline stages.

SURVEY §5 calls for "structured per-stage timers + jax.profiler traces" as
the replacement for the reference's tracing-crate instrumentation. Stage
wall-times live in utils/tracing.py; this module adds on-demand XLA/TPU
trace capture viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None) -> Iterator[str]:
    """Capture a jax.profiler trace for the enclosed block.

    with profile_trace("/tmp/trace") as d:
        pipe.predict(images)
    # then: tensorboard --logdir /tmp/trace  (or open in Perfetto)
    """

    log_dir = log_dir or os.environ.get("OAR_TPU_TRACE_DIR",
                                        "/tmp/oar_ocr_tpu_trace")
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-span inside a trace (maps to TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)

"""Device mesh construction and sharded pipeline steps.

TPU-native scaling layer (SURVEY §2.7): the reference is a single-host
library whose only parallelism is CPU thread pools and batch chunking; here
the batch (pages / pooled crops) axis is sharded over a named ``data`` mesh
axis via `jax.sharding`, which is the primary v5e-8 strategy for the ≥50
pages/s target — every model is ≤ a few M params and fully replicated, so
no parameter collectives are required. The ``model`` axis carries
Megatron-style tensor parallelism for the VLM decoders (parallel/tp.py):
column-sharded q/k/v + gate/up + lm_head, row-sharded o/down, GSPMD
inserting the all-reduces — a decode-latency lever beyond the
single-device reference.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(n_data: Optional[int] = None, n_model: int = 1,
               devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the local devices."""
    devs = np.array(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devs) // n_model
    devs = devs[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, array) -> jax.Array:
    """Place a host batch onto the mesh, sharded over its leading axis."""
    return jax.device_put(array, data_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)

"""Mesh parallelism: data-parallel batch sharding (mesh.py, wired into the
production pipelines via Runtime) and Megatron-style tensor parallelism for
the VLM decoders (tp.py, wired via Runtime.put_params_vl)."""

from .mesh import build_mesh
from .tp import param_shardings, partition_params, tp_spec

__all__ = ["build_mesh", "param_shardings", "partition_params", "tp_spec"]

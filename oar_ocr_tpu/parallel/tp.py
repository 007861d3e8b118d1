"""Tensor-parallel parameter partitioning for the VLM decoders.

TPU-native capability beyond the reference (SURVEY §2.7: the reference is
single-device; "optionally TP via shard_map on MLP/heads for latency" is
the named extension): Megatron-style sharding of the attention-head and
FFN dimensions over the mesh's ``model`` axis, composing with batch data
parallelism over ``data`` on the same 2-D mesh.

Mechanism: parameters are *placed* with `NamedSharding`s chosen by
path rules — column-parallel projections (q/k/v, gate/up, lm_head) shard
their output dimension, row-parallel projections (o, down) shard their
input dimension. Under `jit`, GSPMD propagates these shardings through
the decode graph and inserts exactly one all-reduce after each
row-parallel matmul — the XLA analog of Megatron's NCCL all-reduce,
riding ICI. The KV cache (created inside the jitted step) inherits a
head-sharded layout from the sharded k/v projections, so per-chip KV
memory also drops by the TP factor.

Sharding never changes semantics (only data placement and reduction
order): `tests/test_parallel.py` and `__graft_entry__.dryrun_multichip`
assert TP×DP outputs match the replicated single-device run.

Covers both decoder naming families:
- `vl/decoder.py` CausalLM: q/k/v/o, gate_proj/up_proj/down_proj, lm_head
- `vl/llm_decoders.py` UnifiedDecoder (exact stacks): q_proj/k_proj/
  v_proj/o_proj, gate_up_proj/gate_proj/up_proj/down_proj, and the
  Ovis GDN projections (in_proj_qkv/in_proj_z/out_proj).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Column-parallel: kernel (in, out) → shard OUT over ``model``; the bias
# (if any) is sharded the same way. Packed projections (gate_up_proj,
# in_proj_qkv) are sharded too — GSPMD reshards across the later split,
# which is still semantically exact.
_COL_PARALLEL = frozenset({
    "q", "k", "v", "q_proj", "k_proj", "v_proj",
    "gate_proj", "up_proj", "gate_up_proj",
    "lm_head", "in_proj_qkv", "in_proj_z",
})

# Row-parallel: kernel (in, out) → shard IN over ``model``. The matmul
# output is partial-summed per chip; GSPMD inserts the all-reduce.
_ROW_PARALLEL = frozenset({"o", "o_proj", "down_proj", "out_proj"})


def _key_name(entry) -> str:
    """Stringify one tree-path entry (DictKey / GetAttrKey / index)."""
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def path_names(path) -> Tuple[str, ...]:
    return tuple(_key_name(e) for e in path)


def tp_spec(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one parameter by its tree path.

    Everything not matched (norm scales, embeddings, biases of
    row-parallel layers, vision tower, per-head norms) stays replicated.
    """
    if len(path) < 2:
        return P()
    leaf_name = path[-1]
    # flax stores dotted layer names ('self_attn.q_proj') as one dict
    # key — match on the last dot component so the Hunyuan/exact stacks
    # shard like the plainly-named ones
    parent = path[-2].rsplit(".", 1)[-1]
    ndim = getattr(leaf, "ndim", 0)
    if leaf_name == "kernel" and ndim == 2:
        if parent in _COL_PARALLEL:
            return P(None, "model")
        if parent in _ROW_PARALLEL:
            return P("model", None)
    if leaf_name == "bias" and ndim == 1 and parent in _COL_PARALLEL:
        return P("model")
    return P()


def param_shardings(params, mesh: Mesh,
                    rules: Callable[[Tuple[str, ...], object], P] = tp_spec):
    """NamedSharding pytree matching ``params`` (for jit in_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: NamedSharding(mesh, rules(path_names(p), leaf)),
        params)


def partition_params(params, mesh: Mesh,
                     rules: Callable[[Tuple[str, ...], object], P] = tp_spec):
    """Place a parameter pytree onto the mesh under the TP rules."""
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: jax.device_put(
            leaf, NamedSharding(mesh, rules(path_names(p), leaf))),
        params)

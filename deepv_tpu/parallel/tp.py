"""Tensor-parallel parameter shardings for the MMDiT.

Megatron-style column/row splits expressed as NamedShardings over a mesh
axis; GSPMD propagates the activation shardings and inserts the reduce
collectives over ICI. Replaces nothing in the reference (it has no TP —
SURVEY.md parallelism inventory) — this is scale-out capability the TPU
rebuild adds.

Split scheme per block:
  - qkv / added-qkv projections: column-split (heads shard across tp)
  - attention output projections: row-split (contract the sharded feature)
  - feed-forward: proj column-split, out row-split
  - AdaLN modulation, norms, embedders: replicated (small, elementwise use)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_COL = ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj")
_ROW = ("to_out", "to_add_out")


def mmdit_param_spec(path, leaf, tp_axis: str = "tp"):
    keys = [getattr(p, "key", getattr(p, "name", None)) or str(getattr(p, "idx", ""))
            for p in path]
    name = "/".join(str(k) for k in keys)
    is_weight = name.endswith("weight")
    is_bias = name.endswith("bias")
    if leaf.ndim >= 2 and is_weight:
        parent = keys[-2] if len(keys) >= 2 else ""
        if parent in _COL:
            return P(tp_axis, None)
        if parent in _ROW:
            return P(None, tp_axis)
        if parent == "proj" and "ff" in keys:        # ff.proj
            return P(tp_axis, None)
        if parent == "out" and "ff" in keys:          # ff.out
            return P(None, tp_axis)
        if parent == "proj" and "ff_context" in keys:
            return P(tp_axis, None)
        if parent == "out" and "ff_context" in keys:
            return P(None, tp_axis)
    if is_bias and len(keys) >= 2:
        parent = keys[-2]
        if parent in _COL or (parent == "proj" and ("ff" in keys or "ff_context" in keys)):
            return P(tp_axis)
    return P()


def mmdit_param_shardings(params, mesh: Mesh, tp_axis: str = "tp"):
    """NamedSharding pytree matching the MMDiT parameter tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, mmdit_param_spec(path, leaf, tp_axis)),
        params)


def shard_mmdit_params(params, mesh: Mesh, tp_axis: str = "tp"):
    return jax.device_put(params, mmdit_param_shardings(params, mesh, tp_axis))

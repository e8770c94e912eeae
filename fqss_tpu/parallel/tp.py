"""Tensor-parallel (Megatron-style) sharding specs for the transformer models.

The reference is data-parallel only (SURVEY §2.7) — separation models are
small enough that DP covers training. This module goes beyond parity: it
annotates the transformer weights of Sepformer (and any model using
``QMultiheadAttention`` / ``ffn_in``/``ffn_out`` QDense pairs, e.g. the
HTDemucs cross-transformer) with a ``tp`` mesh axis in the idiomatic JAX
way — *shardings on params, collectives by XLA*:

* attention in-projection  [E, 3E]  -> column-parallel  P(None, 'tp')
* attention out-projection [E, E]   -> row-parallel     P('tp', None)
* FFN first linear         [E, F]   -> column-parallel  P(None, 'tp')
* FFN second linear        [F, E]   -> row-parallel     P('tp', None)

Per-out-channel weight-quantizer ranges and per-tensor activation grids
stay replicated: they are elementwise consumers of the sharded kernels, so
GSPMD partitions them with the op. Everything not matched is replicated —
the specs compose with a leading ``dp`` batch axis (2-D (dp, tp) mesh) for
the full training step; gradient all-reduces over ``dp`` and the
row-parallel partial-sum reductions over ``tp`` are both emitted by XLA
from the sharding propagation, never written by hand.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, tree_map_with_path

_COL_KERNELS = {"in_proj_kernel"}  # [.., out] sharded on axis 1
_COL_BIASES = {"in_proj_bias"}
_ROW_KERNELS = {"out_proj_kernel"}  # [in, ..] sharded on axis 0
_COL_PARENTS = {"ffn_in"}  # QDense modules whose kernel is column-parallel
_ROW_PARENTS = {"ffn_out"}  # QDense modules whose kernel is row-parallel


def _path_keys(path) -> list[str]:
    return [k.key for k in path if isinstance(k, DictKey)]


def _leaf_spec(path, leaf, axis: str) -> P:
    keys = _path_keys(path)
    if not keys or keys[0] != "params":
        return P()
    name = keys[-1]
    parent = keys[-2] if len(keys) >= 2 else ""
    if name in _COL_KERNELS:
        return P(None, axis)
    if name in _COL_BIASES:
        return P(axis)
    if name in _ROW_KERNELS:
        return P(axis, None)
    if parent in _COL_PARENTS:
        if name == "kernel":
            return P(None, axis)
        if name == "bias":
            return P(axis)
    if parent in _ROW_PARENTS and name == "kernel":
        return P(axis, None)
    return P()


def transformer_tp_specs(variables, axis: str = "tp", mesh: Mesh | None = None):
    """PartitionSpec (or NamedSharding, if ``mesh`` given) pytree matching
    ``variables``, with Megatron column/row-parallel specs on the
    transformer projections and replication elsewhere.

    Only divisible shardings are annotated: when ``mesh`` is given, any
    matched dim not divisible by the ``axis`` size falls back to
    replicated (keeps the helper usable on odd head/FFN widths).
    """
    n = None if mesh is None else mesh.shape[axis]

    def spec(path, leaf):
        s = _leaf_spec(path, leaf, axis)
        if n is not None and s != P():
            for dim, name in zip(leaf.shape, s):
                if name is not None and dim % n != 0:
                    s = P()
                    break
        return s if mesh is None else NamedSharding(mesh, s)

    return tree_map_with_path(spec, variables)


def shard_variables_tp(variables, mesh: Mesh, axis: str = "tp"):
    """Place model variables on ``mesh`` with transformer TP shardings."""
    shardings = transformer_tp_specs(variables, axis=axis, mesh=mesh)
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)

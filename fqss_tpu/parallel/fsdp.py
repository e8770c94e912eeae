"""FSDP / ZeRO-3-style parameter + optimizer-state sharding.

The reference is data-parallel with fully replicated state (SURVEY §2.7:
every DDP rank holds the whole model, its gradients, and its own full Adam
moments). This module goes beyond parity the idiomatic JAX way — *shardings
on state, collectives by XLA*: every large array leaf of the
:class:`~fqss_tpu.train.state.TrainState` (params, float-teacher weights,
Adam mu/nu — which mirror the param tree) is sharded over the data axis of
the mesh. From those annotations GSPMD emits per-layer parameter
all-gathers in the forward/backward and gradient reduce-scatters, and the
optimizer update runs on the shard — per-device memory for weights +
optimizer drops by ~1/N while the train-step math is unchanged.

For these separation models (<100 MB) FSDP is about headroom, not
necessity: it is what lets the same trainer scale to wide-encoder /
many-repeat variants and long-segment activations without replicating
3x-params of Adam state on every chip.

Composition: the sharding axis defaults to ``dp`` — batch and state shard
over the SAME axis (ZeRO-3). On a 2-D (dp, tp) mesh, apply
:func:`fqss_tpu.parallel.tp.shard_variables_tp` first and pass
``skip_sharded=True`` (the default) — leaves already carrying a non-trivial
sharding are left alone, so FSDP picks up everything TP did not partition.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_sharding(leaf, mesh: Mesh, axis: str = "dp", min_size: int = 2**12) -> NamedSharding:
    """The FSDP NamedSharding for one array leaf (replicated if too small
    or no dim divides the axis size)."""
    n = mesh.shape[axis]
    shape = getattr(leaf, "shape", ())
    best, best_dim = None, 0
    for d, dim in enumerate(shape):
        if dim % n == 0 and dim > best_dim:
            best, best_dim = d, dim
    if not shape or int(np.prod(shape)) < min_size or best is None:
        return NamedSharding(mesh, P())
    spec = [None] * len(shape)
    spec[best] = axis
    return NamedSharding(mesh, P(*spec))


def shard_state_fsdp(state, mesh: Mesh, axis: str = "dp", min_size: int = 2**12,
                     skip_sharded: bool = True):
    """Place a TrainState (or any pytree of arrays) on ``mesh`` with ZeRO-3
    shardings: every large array leaf sharded over ``axis``, small/odd
    leaves replicated.

    ``skip_sharded``: leaves that already carry a non-replicated sharding on
    this mesh (e.g. from :func:`~fqss_tpu.parallel.tp.shard_variables_tp`)
    are left untouched, so TP + FSDP compose.
    """

    def place(leaf):
        if skip_sharded:
            s = getattr(leaf, "sharding", None)
            if isinstance(s, NamedSharding) and s.spec != P():
                return leaf
        return jax.device_put(leaf, fsdp_sharding(leaf, mesh, axis, min_size))

    return jax.tree_util.tree_map(place, state)

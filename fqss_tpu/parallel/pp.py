"""Pipeline parallelism (GPipe) over homogeneous layer stacks.

The reference is data-parallel only (SURVEY §2.7). This module adds the
remaining classic scaling axis the TPU runtime supports natively: the
repeated transformer layers of Sepformer/DPTNet (``layer_0..layer_{N-1}``,
identical structure — sepformerq.py:98-123 stacks 8 of them per block) are
*stages* sharded over a ``pp`` mesh axis, and microbatches flow through the
stages in the GPipe schedule.

TPU-native shape of the idea:

* stage weights: every per-layer param/quantizer leaf is stacked on a new
  leading stage axis and sharded ``P('pp')`` — each device holds only its
  own layers' weights (the PP memory win).
* schedule: one ``shard_map`` program; each tick every stage applies its
  local layers (a ``lax.scan`` when a stage owns several) and hands its
  activation to the next stage with ``lax.ppermute`` — a neighbor hop that
  rides ICI. ``M`` microbatches drain in ``M + S - 1`` ticks (the GPipe
  bubble).
* training: ``ppermute``/``where`` are differentiable, so ``jax.grad``
  through :func:`pipeline_apply` yields exactly the pipelined backward pass
  (reverse ppermute chain), no hand-written send/recv.

For the small separation models PP is not the profitable axis (DP/TP are);
this exists so the framework scales past single-chip-resident models and is
verified for forward+gradient equality against the sequential stack
(tests/test_pp.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.8
    import inspect

    from jax import shard_map as _shard_map

    _SM_CHECK_KW = (
        "check_vma" if "check_vma" in inspect.signature(_shard_map).parameters else "check_rep"
    )
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

    _SM_CHECK_KW = "check_rep"


def layer_stack_vars(variables, path: tuple[str, ...] = (), prefix: str = "layer_", n_layers: int | None = None):
    """Stack the per-layer variable subtrees ``<path>/layer_i`` on a new
    leading stage axis.

    ``variables`` is a flax variable dict ({"params": ..., "qparams": ...});
    ``path`` walks to the module that owns the ``layer_i`` children (e.g.
    ``("masker", "dual_0", "intra")`` for a Sepformer intra block). Returns a
    variable dict shaped like ONE layer's variables with every leaf gaining a
    leading ``[n_layers]`` axis — the input :func:`pipeline_apply` expects.
    """
    out = {}
    for col, tree in variables.items():
        node = tree
        for k in path:
            if node is None or k not in node:
                node = None
                break
            node = node[k]
        if node is None:
            continue
        names = sorted(
            (k for k in node if k.startswith(prefix) and k[len(prefix):].isdigit()),
            key=lambda s: int(s[len(prefix):]),
        )
        if n_layers is not None:
            names = names[:n_layers]
        if not names:
            continue
        out[col] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *(node[n] for n in names))
    return out


def stage_sharding(mesh: Mesh, axis: str = "pp") -> NamedSharding:
    """Sharding for stacked layer variables: stage axis split over ``pp``."""
    return NamedSharding(mesh, P(axis))


def shard_layer_stack(stacked, mesh: Mesh, axis: str = "pp"):
    """Place stacked layer variables with each device holding its stages."""
    sh = stage_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), stacked)


def pipeline_apply(apply_fn, stacked_vars, x, mesh: Mesh, *, axis: str = "pp", n_microbatches: int | None = None):
    """Run ``x`` through the stacked layers with GPipe microbatch pipelining.

    ``apply_fn(one_layer_vars, x) -> y`` applies a single layer (same shape
    in/out — the transformer-layer contract); ``stacked_vars`` is the
    :func:`layer_stack_vars` output (leaves ``[n_layers, ...]``) with
    ``n_layers`` divisible by the ``pp`` axis size (each stage scans its
    local layers). ``x`` has a leading batch dim divisible by
    ``n_microbatches`` (default: the number of stages).
    """
    S = mesh.shape[axis]
    M = int(n_microbatches or S)
    B = x.shape[0]
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by n_microbatches {M}")
    n_layers = jax.tree_util.tree_leaves(stacked_vars)[0].shape[0]
    if n_layers % S != 0:
        raise ValueError(f"{n_layers} layers not divisible by {S} pipeline stages")

    mb = x.reshape(M, B // M, *x.shape[1:])

    def stage(local_vars, h):
        # a stage owns n_layers // S consecutive layers: scan them in order
        def body(h, per_layer):
            return apply_fn(per_layer, h), None

        h, _ = lax.scan(body, h, local_vars)
        return h

    def pipe(local_vars, mb):
        idx = lax.axis_index(axis)
        zero = jnp.zeros_like(mb[0])
        recv = zero
        outs = jnp.zeros(mb.shape, mb.dtype)
        for t in range(M + S - 1):
            feed = mb[t] if t < M else zero  # static t: no dynamic slicing
            h = jnp.where(idx == 0, feed, recv)
            y = stage(local_vars, h)
            j = t - (S - 1)
            if 0 <= j < M:
                outs = outs.at[j].set(jnp.where(idx == S - 1, y, outs[j]))
            if S > 1:
                recv = lax.ppermute(y, axis, [(i, i + 1) for i in range(S - 1)])
        # only the last stage holds real outputs; broadcast them to the mesh
        outs = lax.psum(jnp.where(idx == S - 1, outs, jnp.zeros_like(outs)), axis)
        return outs

    specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_vars)
    fn = _shard_map(
        pipe,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P(),
        **{_SM_CHECK_KW: False},
    )
    out = fn(stacked_vars, mb)
    return out.reshape(B, *out.shape[2:])


def pipeline_layer_module(layer_module, stacked_vars, x, mesh: Mesh, *, axis: str = "pp", n_microbatches: int | None = None):
    """:func:`pipeline_apply` for a flax layer module (e.g. a bound
    ``TransformerLayer``): ``apply_fn = layer_module.apply`` per stage layer."""
    return pipeline_apply(
        partial(_apply_module, layer_module),
        stacked_vars,
        x,
        mesh,
        axis=axis,
        n_microbatches=n_microbatches,
    )


def _apply_module(layer_module, per_layer_vars, h):
    return layer_module.apply(per_layer_vars, h)

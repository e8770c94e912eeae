"""Device mesh + sharding helpers — the framework's parallelism backbone.

TPU-native replacement for the reference's four torch.distributed/NCCL data
-parallel flavors (reference: SURVEY.md 2.7 — PL DDP, speechbrain ddp_init,
manual per-GPU subprocess spawn in tasnet_musdbhq_trainer.py:8-57, dora
distrib): one SPMD program over a ``jax.sharding.Mesh``. Batches are sharded
over the ``dp`` axis; parameters are replicated; XLA emits the gradient
all-reduce over ICI from the sharding propagation — no process spawning, no
rendezvous, no explicit collectives.

Multi-host (DCN) extends the same mesh via ``jax.distributed.initialize``;
see :func:`make_mesh`'s ``devices`` argument.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "dp", devices=None) -> Mesh:
    """A 1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested a {n_devices}-device mesh but only {len(devices)} "
                f"devices are visible ({devices}). For virtual CPU devices set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N and force "
                "jax.config.update('jax_platforms', 'cpu') before first use."
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim over the dp axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Place a host batch (pytree of arrays, leading batch dim) on the mesh.

    The equivalent of DistributedSampler sharding (musdbhq_train.py:294-299)
    done by device placement instead of per-rank data loaders.
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def initialize_multihost(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Multi-host (DCN) initialization — the jax.distributed analog of the
    reference's three rendezvous styles (TCP free_port, PL-managed, dora;
    SURVEY.md §2.7). After this, jax.devices() spans all hosts and the same
    make_mesh/shard_batch code scales across them; per-host data loading
    should stride by jax.process_index() (as distrib.py:105 does manually).
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)

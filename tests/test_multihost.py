"""Multi-host (multi-process) smoke: jax.distributed over 2 CPU processes.

Exercises fqss_tpu.parallel.mesh.initialize_multihost the way a real
multi-host TPU pod would use it (SURVEY.md §2.7: the replacement for the
reference's three torch.distributed rendezvous styles): two controllers
join a coordinator, see a global device view, build one mesh over all
devices, and a jitted global reduction returns the cross-process sum on
every controller.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    rank, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax
    jax.config.update("jax_platforms", "cpu")
    from fqss_tpu.parallel.mesh import initialize_multihost, make_mesh

    initialize_multihost(f"localhost:{port}", num_processes=nproc, process_id=rank)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(2 * nproc)
    global_batch = np.arange(4.0 * nproc, dtype=np.float32).reshape(2 * nproc, 2)
    local = global_batch[rank * 2 : (rank + 1) * 2]
    arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("dp")), local)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    expect = float(global_batch.sum())
    got = float(jax.device_get(total))
    assert got == expect, (got, expect)
    print(f"MULTIHOST_OK rank={rank} total={got}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_multihost_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(rank), "2", str(port)],
            cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}\n{err}"
        assert f"MULTIHOST_OK rank={rank}" in out, out

"""Profiling: analytic MAC reporting + jax.profiler trace hooks.

The reference's only profiling facility is the per-layer MAC counter
(reference: load_model.py:11-14 ``set_mac_op`` + the calc_mac_op formulas in
qat_layers.py). Here MACs are sown into the ``macs`` collection on demand
(fqss_tpu.nn.layers.sow_macs); this module aggregates them and adds the TPU
upgrade: ``trace`` context manager around any step to capture a
jax.profiler trace viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax

from fqss_tpu.nn.layers import MACS


def count_macs(model, variables: dict, *args, **kwargs) -> tuple[float, dict]:
    """(total_macs, per_module_tree) for one forward — the set_mac_op analog.

    Runs the model with the macs collection mutable and aggregates the sown
    analytic counts.
    """
    _, aux = model.apply(variables, *args, mutable=[MACS], **kwargs)
    tree = jax.device_get(aux.get(MACS, {}))

    def total(node: Any) -> float:
        if isinstance(node, dict):
            return sum(total(v) for v in node.values())
        if isinstance(node, (tuple, list)):
            return sum(float(v) for v in node)
        return float(node)

    return total(tree), tree


def format_macs(macs: float) -> str:
    for unit, div in (("GMAC", 1e9), ("MMAC", 1e6), ("kMAC", 1e3)):
        if macs >= div:
            return f"{macs / div:.2f} {unit}"
    return f"{macs:.0f} MAC"


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a block: with trace('/tmp/prof'): step(...)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def save_log(work_dir: str, text: str) -> None:  # re-export convenience
    from fqss_tpu.train.checkpoints import save_log as _sl

    _sl(work_dir, text)

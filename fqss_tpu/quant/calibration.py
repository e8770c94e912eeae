"""Host-side calibration: MSE-optimal range search for MseActQuantizer.

Completes the reference's histogram/MSE calibration flow
(reference: quantization/qat/qat_quant.py:245-326): the device accumulates
a running histogram during the observer phase (MseActQuantizer); after
``max_observations`` steps this module grid-searches the N x N (min, max)
candidates minimizing the histogram-weighted quantization MSE and writes the
winning ranges back into ``qparams`` — the functional analog of
``mse_minmax_range`` flipping ``observer_mode`` off.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

import jax

from fqss_tpu.quant.quantizers import QPARAMS, QSTATS

# MseActQuantizer.max_observations default — the observer window length after
# which the reference's MSE quantizer self-calibrates (qat_quant.py:306-326).
DEFAULT_OBSERVER_WINDOW = 50


def has_pending_mse(qstats) -> bool:
    """True if the qstats tree holds any MSE histogram not yet calibrated.

    Used by the recipes to decide whether a training run needs the host-side
    calibration pass at the observer-window boundary, and by the factory to
    finish calibration when importing a state saved mid-observer.
    """
    if not qstats:
        return False
    pending = False

    def walk(node):
        nonlocal pending
        if pending or not isinstance(node, Mapping):
            return
        if "hist" in node and "calibrated" in node:
            if not bool(np.asarray(jax.device_get(node["calibrated"]))):
                pending = True
            return
        for v in node.values():
            walk(v)

    walk(qstats)
    return pending


def run_observer(model, variables: dict, x, steps: int = 55, **apply_kwargs) -> dict:
    """Run the activation-observer EMA window: ``steps`` forwards with the
    quant collections mutable, returning the updated variables.

    The reference runs its observer phase implicitly during the first ~50
    train steps (qat_quant.py:227-242); this is the standalone calibration
    entry point (and the fast path for tests/tools: the update step is
    jitted once instead of re-traced eagerly per step). ``model`` must carry
    ``observer=True`` in its QuantSpec.
    """
    import jax

    @jax.jit
    def one(var):
        _, upd = model.apply(var, x, mutable=[QPARAMS, QSTATS], **apply_kwargs)
        return {**var, **upd}

    var = dict(variables)
    for _ in range(steps):
        var = one(var)
    return jax.device_get(var)


def _linear_quantize_np(x: np.ndarray, mn: float, mx: float, n_bits: int) -> np.ndarray:
    """Uniform (asymmetric) grid, numpy (matches fake_quant.linear_fake_quant sym=False)."""
    qmax = 2**n_bits - 1
    delta = (mx - mn) / qmax
    if delta <= 0:
        return np.full_like(x, mn)
    X = np.round((x - mn) / delta)
    return delta * np.clip(X, 0, qmax) + mn


def mse_minmax_range(
    hist: np.ndarray, val_min: float, val_max: float, n_bits: int = 8, n_grid: int = 100
) -> tuple[float, float]:
    """Grid search the MSE-optimal (min, max) over the histogram
    (qat_quant.py:291-304: N x N candidates, histogram-weighted MSE)."""
    n_bins = len(hist)
    bins = np.linspace(val_min, val_max, n_bins, endpoint=False)
    weights = hist / max(hist.sum(), 1e-12)
    delta = 0.5 * (val_max - val_min) / n_grid
    best = (val_min, val_max, np.inf)
    for i in range(n_grid):
        mn_i = val_min + delta * i
        for j in range(n_grid):
            mx_j = val_max - delta * j
            if mx_j <= mn_i:
                break
            q = _linear_quantize_np(bins, mn_i, mx_j, n_bits)
            err = float(np.sum((bins - q) ** 2 * weights))
            if err < best[2]:
                best = (mn_i, mx_j, err)
    return best[0], best[1]


def calibrate_mse_quantizers(variables: dict, n_bits: int = 8, n_grid: int = 100) -> dict:
    """Walk qstats for accumulated histograms, grid-search ranges on the host,
    and return updated variables with calibrated qparams + ``calibrated`` flags.

    Call once after the observer window (the MseActQuantizer then quantizes).
    """
    if QSTATS not in variables:
        return variables
    qstats = jax.device_get(variables[QSTATS])
    qparams = jax.device_get(variables[QPARAMS])

    def walk(stats_node, params_node):
        if isinstance(stats_node, dict):
            if "hist" in stats_node and "calibrated" in stats_node:
                hist = np.asarray(stats_node["hist"])
                if hist.sum() > 0 and not bool(stats_node["calibrated"]):
                    mn, mx = mse_minmax_range(
                        hist, float(stats_node["val_min"]), float(stats_node["val_max"]),
                        n_bits=n_bits, n_grid=n_grid,
                    )
                    params_node["min_range"] = np.asarray([mn], np.float32)
                    params_node["max_range"] = np.asarray([mx], np.float32)
                    stats_node["calibrated"] = np.asarray(True)
                return
            for k, v in stats_node.items():
                if isinstance(v, dict) and isinstance(params_node, dict) and k in params_node:
                    walk(v, params_node[k])
                elif isinstance(v, dict):
                    walk(v, {})

    qstats = jax.tree_util.tree_map(np.asarray, qstats)
    qparams = jax.tree_util.tree_map(np.asarray, qparams)
    walk(qstats, qparams)
    out = dict(variables)
    out[QSTATS] = qstats
    out[QPARAMS] = qparams
    return out

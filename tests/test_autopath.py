"""serve.autopath: measured-best serving path selection (--engine auto).

Checks (VERDICT r4 item 4):
* the static BEST_PATHS table is never slower than the f32 default on the
  committed per-model bench numbers (BENCH_models_r04.json);
* auto_serving_model rebuilds each family on its table path and the result
  is numerically equivalent to the default path (exact where only folding
  changes, tolerance where the table switches compute dtype).
"""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.quant import QuantSpec
from fqss_tpu.serve.autopath import BEST_PATHS, auto_serving_model, best_path, path_label

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

Q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)


def _latest_bench():
    cands = sorted(
        f for f in os.listdir(REPO) if f.startswith("BENCH_models_r") and f.endswith(".json")
    )
    assert cands, "no committed BENCH_models_r*.json"
    with open(os.path.join(REPO, cands[-1])) as f:
        return {r["model"]: r for r in json.load(f)["rows"]}


MODEL_KEYS = {
    "ConvTasNet": "convtasnet",
    "Sepformer": "sepformer",
    "DPTNet": "dptnet",
    "ConvTasNetMusic": "convtasnet_music",
    "HTDemucs": "htdemucs",
}


def test_table_never_slower_than_f32_on_committed_bench():
    rows = _latest_bench()
    for family, overrides in BEST_PATHS.items():
        row = rows[MODEL_KEYS[family]]
        label = path_label(overrides)
        assert label in row["paths_ms"], f"{family}: path {label} not measured"
        assert row["paths_ms"][label] <= row["paths_ms"]["float32"] + 1e-9, (
            f"{family}: auto path {label} ({row['paths_ms'][label]} ms) slower than "
            f"f32 ({row['paths_ms']['float32']} ms)"
        )


def test_table_is_the_measured_argmin_of_its_choices():
    """The table should pick the bench argmin among the paths auto can
    express (f32 / bf16 / bf16+pallas flag — the int8 engines are separate
    --engine int8 territory)."""
    rows = _latest_bench()
    for family, overrides in BEST_PATHS.items():
        row = rows[MODEL_KEYS[family]]
        expressible = {k: v for k, v in row["paths_ms"].items() if k != "int8-engine"}
        assert row["paths_ms"][path_label(overrides)] == min(expressible.values()), (
            f"{family}: table path {path_label(overrides)} is not the measured argmin"
        )


def _build(family):
    if family == "ConvTasNet":
        from fqss_tpu.models import ConvTasNet

        m = ConvTasNet(n_srcs=2, kernel_size=16, stride=8, n_filters=64, bn_chan=16,
                       hid_chan=32, n_blocks=2, n_repeats=1, q=Q)
        return m, jnp.zeros((1, 1024))
    if family == "Sepformer":
        from fqss_tpu.models.sepformer import Sepformer

        m = Sepformer(n_srcs=2, kernel_size=16, stride=8, n_filters=32, n_repeats=1,
                      n_heads=2, chunk_size=16, n_ffn=32, n_layers=1, q=Q)
        return m, jnp.zeros((1, 1024))
    if family == "ConvTasNetMusic":
        from fqss_tpu.models.convtasnet_music import ConvTasNetMusic

        m = ConvTasNetMusic(n_filters=32, kernel_size=16, stride=8, bn_chan=16,
                            hid_chan=32, n_blocks=2, n_repeats=1, q=Q)
        return m, jnp.zeros((1, 2, 1024))
    raise ValueError(family)


@pytest.mark.parametrize("family", ["ConvTasNet", "Sepformer", "ConvTasNetMusic"])
def test_auto_serving_model_equivalent(family):
    model, x = _build(family)
    variables = model.init(jax.random.PRNGKey(0), x)
    xr = jax.random.uniform(jax.random.PRNGKey(1), x.shape, minval=-0.5, maxval=0.5)
    ref = model.apply(variables, xr)

    smodel, svars = auto_serving_model(model, variables)
    out = smodel.apply(svars, xr)

    if best_path(model).get("compute_dtype", "float32") == "float32":
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    else:
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=0)
    # folding actually happened: the serving model no longer re-quantizes
    assert not smodel.q.weight_quant


def test_unknown_family_defaults_to_f32():
    import flax.linen as nn

    class Other(nn.Module):
        q: QuantSpec = Q

        @nn.compact
        def __call__(self, x):
            return x

    assert best_path(Other()) == {"compute_dtype": "float32"}


def test_overrides_only_touch_valid_spec_fields():
    for overrides in BEST_PATHS.values():
        fields = {f.name for f in dataclasses.fields(QuantSpec)}
        assert set(overrides) <= fields

"""Tensor-parallel shardings (parallel/tp.py): Megatron column/row specs on
the Sepformer transformer, forward equality vs the replicated model, and a
full KD train step on a 2-D (dp, tp) mesh matching the single-device update.
Runs on the 8 virtual CPU devices from conftest.py.

Note on tolerances: repartitioning a matmul changes its accumulation order,
and the fake-quant grids amplify ULP-level differences to whole grid LSBs
(the same cross-compilation noise floor PARITY.md documents for the int8
engines) — so the float model is compared tightly and the QAT model
statistically (grid-LSB agreement), not bitwise."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fqss_tpu.models.sepformer import Sepformer
from fqss_tpu.parallel.tp import shard_variables_tp, transformer_tp_specs
from fqss_tpu.quant import QuantSpec

KW = dict(n_srcs=2, kernel_size=16, stride=8, n_filters=32, n_repeats=1,
          n_heads=4, chunk_size=20, n_ffn=64, n_layers=1)


def _model_and_vars(q=QuantSpec()):
    model = Sepformer(q=q, **KW)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 2000), minval=-1.0, maxval=1.0)
    variables = model.init(jax.random.PRNGKey(1), x)
    return model, variables, x


def _tp_mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("tp",))


def test_tp_specs_match_megatron_pattern():
    _, variables, _ = _model_and_vars(QuantSpec(qat=True, observer=False))
    specs = transformer_tp_specs(variables)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    got = {}
    for path, spec in flat:
        keys = [k.key for k in path if hasattr(k, "key")]
        got["/".join(keys[-2:])] = spec
    assert got["mha/in_proj_kernel"] == P(None, "tp")
    assert got["mha/out_proj_kernel"] == P("tp", None)
    assert got["ffn_in/kernel"] == P(None, "tp")
    assert got["ffn_out/kernel"] == P("tp", None)
    # everything quantizer-side stays replicated
    assert all(s == P() for k, s in got.items() if "fake_quantize" in k or "min_range" in k)


def test_tp_specs_nondivisible_fall_back_to_replicated():
    mesh = _tp_mesh()
    tree = {"params": {"mha": {"in_proj_kernel": jnp.zeros((10, 9))}}}  # 9 % 4 != 0
    s = transformer_tp_specs(tree, mesh=mesh)
    assert s["params"]["mha"]["in_proj_kernel"] == NamedSharding(mesh, P())


def test_tp_forward_matches_replicated_float():
    model, variables, x = _model_and_vars()
    y_ref = model.apply(variables, x)
    v_tp = shard_variables_tp(variables, _tp_mesh())
    y_tp = jax.jit(lambda v, x: model.apply(v, x))(v_tp, x)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref), atol=2e-5)


@pytest.mark.slow
def test_tp_forward_qat_agrees_to_grid_noise():
    """QAT forward under TP: agreement up to isolated grid-LSB flips.

    Ranges are observer-calibrated first — at init defaults the grids
    clip/coarsen so hard that LSB flips dominate the tiny output signal."""
    import dataclasses

    from fqss_tpu.quant.calibration import run_observer

    q_obs = QuantSpec(qat=True, observer=True, out_quant=True)
    model_obs, variables, x = _model_and_vars(q_obs)
    variables = run_observer(model_obs, variables, x, steps=55)
    q = dataclasses.replace(q_obs, observer=False)
    model = Sepformer(q=q, **KW)
    y_ref = np.asarray(model.apply(variables, x))
    v_tp = shard_variables_tp(variables, _tp_mesh())
    y_tp = np.asarray(jax.jit(lambda v, x: model.apply(v, x))(v_tp, x))
    # same output grid: diffs are multiples of the out-quant delta; demand
    # the same separation up to a few LSBs (>=40 dB agreement)
    num = float(np.sum((y_tp - y_ref) ** 2))
    den = float(np.sum(y_ref**2)) + 1e-12
    snr_db = 10 * np.log10(den / (num + 1e-20))
    assert snr_db > 25.0, f"TP vs replicated QAT forward SNR {snr_db:.1f} dB"


@pytest.mark.slow
def test_dp_tp_train_step_matches_single_device():
    from fqss_tpu.train import TrainConfig, create_train_state, make_optimizer, make_train_step

    model, variables, _ = _model_and_vars()  # float model: exact math, no grid cliffs
    teacher = Sepformer(**KW)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.uniform(-1, 1, (4, 2000)).astype(np.float32))
    src = jnp.asarray(rng.uniform(-1, 1, (4, 2, 2000)).astype(np.float32))
    teacher_vars = teacher.init(jax.random.PRNGKey(2), mix)
    cfg = TrainConfig(kd_lambda=0.1, lr=1e-3)
    tx = make_optimizer(cfg)

    def fresh_state():
        return create_train_state(
            {k: v for k, v in variables.items()}, tx, teacher_params=teacher_vars["params"]
        )

    s_ref, m_ref = make_train_step(model, teacher, tx, cfg, donate=False)(fresh_state(), mix, src)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    state = shard_variables_tp(fresh_state(), mesh)
    bsh = NamedSharding(mesh, P("dp"))
    s_tp, m_tp = make_train_step(model, teacher, tx, cfg, donate=False)(
        state, jax.device_put(mix, bsh), jax.device_put(src, bsh)
    )
    assert np.isfinite(float(m_tp["loss"]))
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]), atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4),
        s_tp.params,
        s_ref.params,
    )

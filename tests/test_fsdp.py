"""FSDP/ZeRO-3 state sharding (parallel/fsdp.py): large leaves shard over
the dp axis, small leaves replicate, the sharded KD train step matches the
single-device update, and TP+FSDP compose. 8 virtual CPU devices."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fqss_tpu.models import ConvTasNet
from fqss_tpu.parallel.fsdp import fsdp_sharding, shard_state_fsdp
from fqss_tpu.parallel.mesh import batch_sharding, make_mesh
from fqss_tpu.quant import QuantSpec

KW = dict(n_srcs=2, kernel_size=16, stride=8, n_filters=64, bn_chan=32,
          hid_chan=64, n_blocks=2, n_repeats=1)


def _mesh(n=8):
    return make_mesh(n)


def test_fsdp_sharding_rules():
    mesh = _mesh()
    # large 2-D leaf: largest divisible dim sharded
    s = fsdp_sharding(jnp.zeros((64, 512)), mesh)
    assert s.spec == P(None, "dp")
    # largest dim not divisible -> falls to the other
    s = fsdp_sharding(jnp.zeros((513, 64)), mesh)
    assert s.spec == P(None, "dp")
    # small leaf: replicated
    assert fsdp_sharding(jnp.zeros((4, 4)), mesh).spec == P()
    # scalar: replicated
    assert fsdp_sharding(jnp.zeros(()), mesh).spec == P()
    # nothing divisible: replicated
    assert fsdp_sharding(jnp.zeros((9, 2**13 + 1)), mesh).spec == P()


def _setup(q=QuantSpec()):
    from fqss_tpu.train import TrainConfig, create_train_state, make_optimizer, make_train_step

    model = ConvTasNet(q=q, **KW)
    teacher = ConvTasNet(**KW)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.uniform(-1, 1, (8, 4000)).astype(np.float32))
    src = jnp.asarray(rng.uniform(-1, 1, (8, 2, 4000)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mix)
    tvars = teacher.init(jax.random.PRNGKey(1), mix)
    cfg = TrainConfig(kd_lambda=0.1, lr=1e-3)
    tx = make_optimizer(cfg)

    def fresh():
        return create_train_state(dict(variables), tx, teacher_params=tvars["params"])

    step = make_train_step(model, teacher, tx, cfg, donate=False)
    return fresh, step, mix, src


@pytest.mark.slow
def test_fsdp_train_step_matches_single_device():
    fresh, step, mix, src = _setup()
    s_ref, m_ref = step(fresh(), mix, src)

    mesh = _mesh()
    state = shard_state_fsdp(fresh(), mesh)
    # the big conv kernels must actually be distributed
    flat = jax.tree_util.tree_leaves(state.params)
    assert any(
        isinstance(x.sharding, NamedSharding) and x.sharding.spec != P()
        for x in flat if x.size >= 2**12
    )
    bsh = batch_sharding(mesh)
    s_fsdp, m_fsdp = step(state, jax.device_put(mix, bsh), jax.device_put(src, bsh))
    np.testing.assert_allclose(float(m_fsdp["loss"]), float(m_ref["loss"]), atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4),
        s_fsdp.params,
        s_ref.params,
    )
    # optimizer moments sharded too (ZeRO): at least one distributed leaf
    opt_flat = jax.tree_util.tree_leaves(s_fsdp.opt_state)
    assert any(
        isinstance(x.sharding, NamedSharding) and x.sharding.spec != P()
        for x in opt_flat if getattr(x, "size", 0) >= 2**12
    )


@pytest.mark.slow
def test_fsdp_qat_train_step_runs():
    """QAT state (qparams/qstats collections) shards and steps finitely."""
    fresh, step, mix, src = _setup(QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2))
    mesh = _mesh()
    state = shard_state_fsdp(fresh(), mesh)
    bsh = batch_sharding(mesh)
    s1, m1 = step(state, jax.device_put(mix, bsh), jax.device_put(src, bsh))
    assert np.isfinite(float(m1["loss"]))
    assert int(s1.step) == 1


@pytest.mark.slow
def test_tp_fsdp_compose():
    """TP-sharded transformer leaves survive shard_state_fsdp untouched."""
    from fqss_tpu.models.sepformer import Sepformer
    from fqss_tpu.parallel.tp import shard_variables_tp

    kw = dict(n_srcs=2, kernel_size=16, stride=8, n_filters=32, n_repeats=1,
              n_heads=4, chunk_size=20, n_ffn=64, n_layers=1)
    model = Sepformer(**kw)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 2000), minval=-1.0, maxval=1.0)
    variables = model.init(jax.random.PRNGKey(1), x)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    v = shard_variables_tp(variables, mesh)
    v = shard_state_fsdp(v, mesh, min_size=2**8)
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    saw_tp = saw_dp = False
    for path, leaf in flat:
        keys = [k.key for k in path if hasattr(k, "key")]
        if keys[-1] == "in_proj_kernel":
            assert leaf.sharding.spec == P(None, "tp"), keys  # TP kept
            saw_tp = True
        elif "dp" in jax.tree_util.tree_leaves(list(leaf.sharding.spec)):
            saw_dp = True
    assert saw_tp and saw_dp
    y = jax.jit(lambda v, x: model.apply(v, x))(v, x)
    y_ref = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)

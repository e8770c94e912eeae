"""Pipeline parallelism (parallel/pp.py): GPipe microbatch pipelining of the
Sepformer transformer layer stack over a ``pp`` mesh axis, verified for
forward AND gradient equality against the sequential stack. Runs on the 8
virtual CPU devices from conftest.py.

The pipelined program computes each layer with identical math (same op, same
accumulation order) — only the placement changes — so float equality is
tight; the QAT stack is additionally checked for grid-LSB agreement (fake
-quant amplifies ULP ties to whole LSBs across different XLA compilations,
see tests/test_tp.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fqss_tpu.models.sepformer import TransformerLayer
from fqss_tpu.parallel.pp import layer_stack_vars, pipeline_layer_module, shard_layer_stack
from fqss_tpu.quant import QuantSpec

F, FFN, HEADS, L = 16, 32, 4, 40  # [B, L, F] tokens
N_LAYERS = 4


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("pp",))


def _stack(q=QuantSpec(), n_layers=N_LAYERS, batch=8, seed=0):
    layer = TransformerLayer(F, FFN, HEADS, q=q)
    x = jax.random.normal(jax.random.PRNGKey(seed), (batch, L, F))
    per_layer = [layer.init(jax.random.PRNGKey(10 + i), x) for i in range(n_layers)]
    # emulate a parent module owning layer_0..layer_{n-1}
    variables = {}
    for col in per_layer[0]:
        variables[col] = {f"layer_{i}": dict(per_layer[i][col]) for i in range(n_layers)}
    return layer, variables, per_layer, x


def _sequential(layer, per_layer, x):
    for v in per_layer:
        x = layer.apply(v, x)
    return x


def test_layer_stack_vars_stacks_in_order():
    _, variables, per_layer, _ = _stack()
    stacked = layer_stack_vars(variables)
    leaves = jax.tree_util.tree_leaves(stacked)
    assert all(l.shape[0] == N_LAYERS for l in leaves)
    # order: stage i slice == layer i vars
    got1 = jax.tree_util.tree_map(lambda a: a[1], stacked)
    want1 = jax.tree_util.tree_map(jnp.asarray, dict(per_layer[1]))
    for a, b in zip(jax.tree_util.tree_leaves(got1), jax.tree_util.tree_leaves(want1)):
        assert jnp.array_equal(a, b)


@pytest.mark.parametrize(
    "n_microbatches",
    [2, pytest.param(4, marks=pytest.mark.slow), pytest.param(8, marks=pytest.mark.slow)],
)  # incl. M < stages; one param stays in the fast tier
def test_pipeline_forward_matches_sequential_float(n_microbatches):
    layer, variables, per_layer, x = _stack()
    mesh = _mesh(4)
    stacked = shard_layer_stack(layer_stack_vars(variables), mesh)
    y_pipe = pipeline_layer_module(layer, stacked, x, mesh, n_microbatches=n_microbatches)
    y_seq = _sequential(layer, per_layer, x)
    np.testing.assert_allclose(np.asarray(y_pipe), np.asarray(y_seq), atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_pipeline_multiple_layers_per_stage():
    layer, variables, per_layer, x = _stack(n_layers=8)
    mesh = _mesh(4)  # 2 layers per stage, scanned in order
    stacked = shard_layer_stack(layer_stack_vars(variables), mesh)
    y_pipe = pipeline_layer_module(layer, stacked, x, mesh)
    y_seq = _sequential(layer, per_layer, x)
    np.testing.assert_allclose(np.asarray(y_pipe), np.asarray(y_seq), atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_pipeline_quantized_stack():
    q = QuantSpec(qat=True, observer=False)
    layer, variables, per_layer, x = _stack(q=q)
    mesh = _mesh(4)
    stacked = shard_layer_stack(layer_stack_vars(variables), mesh)
    y_pipe = np.asarray(pipeline_layer_module(layer, stacked, x, mesh))
    y_seq = np.asarray(_sequential(layer, per_layer, x))
    # grid-LSB agreement (different compilation of the same quantized math)
    scale = np.abs(y_seq).max()
    assert np.abs(y_pipe - y_seq).max() <= 1e-2 * scale + 1e-6


@pytest.mark.slow
def test_pipeline_gradient_matches_sequential():
    layer, variables, per_layer, x = _stack()
    mesh = _mesh(4)
    stacked = layer_stack_vars(variables)

    def loss_pipe(sv):
        y = pipeline_layer_module(layer, sv, x, mesh)
        return jnp.sum(y**2)

    def loss_seq(sv):
        h = x
        for i in range(N_LAYERS):
            v = jax.tree_util.tree_map(lambda a, i=i: a[i], sv)
            h = layer.apply(v, h)
        return jnp.sum(h**2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe), jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)


def test_pipeline_validates_divisibility():
    layer, variables, _, x = _stack(n_layers=3)
    mesh = _mesh(4)
    stacked = layer_stack_vars(variables)
    with pytest.raises(ValueError, match="pipeline stages"):
        pipeline_layer_module(layer, stacked, x, mesh)
    layer4, variables4, _, x4 = _stack()
    stacked4 = layer_stack_vars(variables4)
    with pytest.raises(ValueError, match="n_microbatches"):
        pipeline_layer_module(layer4, stacked4, x4, mesh, n_microbatches=3)

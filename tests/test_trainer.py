"""End-to-end QAT training smoke tests: loss decreases, observer phase works,
and the data-parallel step over an 8-device CPU mesh matches single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.data import synth_batch
from fqss_tpu.models import ConvTasNet
from fqss_tpu.parallel import make_mesh, shard_batch
from fqss_tpu.quant import QuantSpec
from fqss_tpu.train import TrainConfig, create_train_state, make_eval_step, make_optimizer, make_train_step


def _tiny_models(observer: bool = False):
    q = QuantSpec(qat=True, observer=observer, n_splitter=2, n_combiner=2, out_quant=True)
    kw = dict(n_srcs=2, kernel_size=16, stride=8, n_filters=64, bn_chan=16, hid_chan=32, n_blocks=2, n_repeats=1)
    return ConvTasNet(q=q, **kw), ConvTasNet(**kw)


def _init_state(model, teacher, cfg, x):
    v = model.init(jax.random.PRNGKey(0), x)
    tv = teacher.init(jax.random.PRNGKey(0), x)
    tx = make_optimizer(cfg)
    return create_train_state(dict(v), tx, teacher_params=tv["params"]), tx


@pytest.mark.slow
def test_qat_overfit_synthetic():
    """The full KD QAT loop must reduce loss on a fixed synthetic batch."""
    model, teacher = _tiny_models()
    cfg = TrainConfig(kd_lambda=0.1, lr=1e-3)
    rng = np.random.default_rng(0)
    mix, src = synth_batch(rng, batch=4, n_src=2, length=4000)
    state, tx = _init_state(model, teacher, cfg, jnp.asarray(mix))
    step = make_train_step(model, teacher, tx, cfg)

    losses = []
    for _ in range(30):
        state, m = step(state, jnp.asarray(mix), jnp.asarray(src))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.5, losses[::10]
    assert int(state.step) == 30
    assert int(state.skipped) == 0


@pytest.mark.slow
def test_observer_phase_then_training():
    model, teacher = _tiny_models(observer=True)
    cfg = TrainConfig(kd_lambda=0.1, lr=1e-3)
    rng = np.random.default_rng(1)
    mix, src = synth_batch(rng, batch=2, n_src=2, length=2000)
    state, tx = _init_state(model, teacher, cfg, jnp.asarray(mix))
    step = make_train_step(model, teacher, tx, cfg)

    q0 = jax.tree_util.tree_leaves(state.qparams)[0]
    for _ in range(3):
        state, m = step(state, jnp.asarray(mix), jnp.asarray(src))
    # observer EMA moved the activation ranges
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.qparams)[:5], jax.tree_util.tree_leaves(
            create_train_state(dict(model.init(jax.random.PRNGKey(0), jnp.asarray(mix))), tx).qparams
        )[:5])
    ]
    assert any(moved)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_skip_nonfinite_batch():
    model, teacher = _tiny_models()
    cfg = TrainConfig(kd_lambda=0.0, lr=1e-3)
    rng = np.random.default_rng(2)
    mix, src = synth_batch(rng, batch=2, n_src=2, length=2000)
    state, tx = _init_state(model, teacher, cfg, jnp.asarray(mix))
    step = make_train_step(model, teacher, tx, cfg)

    bad_mix = jnp.asarray(mix).at[0, 0].set(jnp.nan)
    params_before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, m = step(state, bad_mix, jnp.asarray(src))
    assert bool(m["skipped"])
    np.testing.assert_array_equal(np.asarray(jax.tree_util.tree_leaves(state.params)[0]), np.asarray(params_before))
    assert int(state.skipped) == 1


@pytest.mark.slow
def test_dp_mesh_step_matches_single_device():
    """DP over the 8-device CPU mesh: same batch -> same params as 1 device."""
    model, teacher = _tiny_models()
    cfg = TrainConfig(kd_lambda=0.1, lr=1e-3)
    rng = np.random.default_rng(3)
    mix, src = synth_batch(rng, batch=8, n_src=2, length=2000)
    state, tx = _init_state(model, teacher, cfg, jnp.asarray(mix))
    # donate=False: this test steps the SAME state on two device layouts
    step = make_train_step(model, teacher, tx, cfg, donate=False)

    # single device
    s1, m1 = step(state, jnp.asarray(mix), jnp.asarray(src))

    # 8-device dp mesh
    mesh = make_mesh(8)
    from fqss_tpu.parallel.mesh import replicated_sharding

    rep = replicated_sharding(mesh)
    state_r = jax.device_put(state, rep)
    bmix, bsrc = shard_batch((jnp.asarray(mix), jnp.asarray(src)), mesh)
    s8, m8 = step(state_r, bmix, bsrc)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)[0]
    l8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1), rtol=1e-4, atol=1e-6)


def test_eval_step():
    model, teacher = _tiny_models()
    cfg = TrainConfig()
    rng = np.random.default_rng(4)
    mix, src = synth_batch(rng, batch=2, n_src=2, length=2000)
    state, _ = _init_state(model, teacher, cfg, jnp.asarray(mix))
    ev = make_eval_step(model)
    out = ev(state, jnp.asarray(mix), jnp.asarray(src))
    assert np.isfinite(float(out["val_loss"]))


def test_lr_schedulers():
    from fqss_tpu.train import EarlyStopping, ReduceLROnPlateau

    model, teacher = _tiny_models()
    state, _ = _init_state(model, teacher, TrainConfig(), jnp.zeros((1, 2000)))
    sched = ReduceLROnPlateau(factor=0.5, patience=1)
    state = sched.update(state, 1.0)  # best
    state = sched.update(state, 2.0)  # bad 1
    assert float(state.lr_scale) == 1.0
    state = sched.update(state, 2.0)  # bad 2 -> reduce
    assert float(state.lr_scale) == 0.5

    es = EarlyStopping(patience=2)
    assert not es.update(1.0)
    assert not es.update(1.5)
    assert es.update(1.5)

    # speechbrain grace window (sepformer config dont_halve_until_epoch=20):
    # no reduction inside the window regardless of plateau length.
    gr = ReduceLROnPlateau(factor=0.5, patience=0, dont_halve_until_epoch=3)
    state, _ = _init_state(model, teacher, TrainConfig(), jnp.zeros((1, 2000)))
    state = gr.update(state, 1.0)
    state = gr.update(state, 2.0)  # bad, but inside grace window
    state = gr.update(state, 2.0)  # still inside (epoch 3)
    assert float(state.lr_scale) == 1.0
    state = gr.update(state, 2.0)  # epoch 4: past window -> reduce
    assert float(state.lr_scale) == 0.5

    # StepLR: the DPTNet scheduler (asteroid_librimix_trainer.py:99-101,
    # step_size=2, gamma=0.98) — lr0 * gamma^floor(epochs/step_size).
    from fqss_tpu.train import StepLR

    slr = StepLR(step_size=2, gamma=0.5)
    state, _ = _init_state(model, teacher, TrainConfig(), jnp.zeros((1, 2000)))
    state = slr.update(state)  # after epoch 1
    assert float(state.lr_scale) == 1.0
    state = slr.update(state)  # after epoch 2 -> decay
    assert float(state.lr_scale) == 0.5
    state = slr.update(state)
    assert float(state.lr_scale) == 0.5
    state = slr.update(state)
    assert float(state.lr_scale) == 0.25


@pytest.mark.slow
def test_threshold_byloss_keeps_hard_samples():
    """speechbrain per-sample thresholding: easy samples (loss <= th) are
    dropped from the mean (speechbrain_librimix_trainer.py:144-151)."""
    model, teacher = _tiny_models()
    cfg = TrainConfig(kd_lambda=0.0, lr=1e-3, threshold_byloss=True, threshold=-30.0)
    rng = np.random.default_rng(7)
    mix, src = synth_batch(rng, batch=4, n_src=2, length=2000)
    state, tx = _init_state(model, teacher, cfg, jnp.asarray(mix))
    step = make_train_step(model, teacher, tx, cfg)
    state, m = step(state, jnp.asarray(mix), jnp.asarray(src))
    assert np.isfinite(float(m["loss"]))
    assert int(state.skipped) == 0


@pytest.mark.slow
def test_threshold_byloss_applies_under_kd():
    """The reference applies per-sample thresholding to the KD-weighted loss
    during QAT training (speechbrain_librimix_trainer.py:138-149) — the
    trainer must threshold the KD loss, not just the plain task loss."""
    from fqss_tpu.separation.losses import fqss_kd_loss
    from fqss_tpu.train.trainer import _model_variables

    model, teacher = _tiny_models()
    rng = np.random.default_rng(8)
    mix, src = synth_batch(rng, batch=4, n_src=2, length=2000)
    mixj, srcj = jnp.asarray(mix), jnp.asarray(src)

    # per-sample KD losses from the exact loss function
    cfg0 = TrainConfig(kd_lambda=0.1, lr=1e-3)
    state, _ = _init_state(model, teacher, cfg0, mixj)
    variables = _model_variables(state, state.trainable)
    est = model.apply(variables, mixj)[..., :2000]
    fest = teacher.apply({"params": state.teacher_params}, mixj)[..., :2000]
    per, _ = fqss_kd_loss(est, fest, srcj, kd_lambda=0.1, per_sample=True)
    per = np.asarray(per)
    assert per.shape == (4,)

    # pick a threshold that drops exactly the easiest sample (midpoint, so
    # float noise between plain and under-grad forwards can't flip the mask)
    s = np.sort(per)
    th = float((s[0] + s[1]) / 2)
    expected = per[per > th].mean()

    cfg = TrainConfig(kd_lambda=0.1, lr=1e-3, threshold_byloss=True, threshold=th)
    tx = make_optimizer(cfg)
    # donate=False: the same state is stepped again below
    step = make_train_step(model, teacher, tx, cfg, donate=False)
    _, m = step(state, mixj, srcj)
    # in-step forward differs from the standalone one by f32 fusion noise
    # (~1e-3 rel) — assert the filtered mean, not the plain mean, was used
    np.testing.assert_allclose(float(m["loss"]), expected, rtol=2e-3)
    assert abs(float(m["loss"]) - expected) < abs(float(m["loss"]) - per.mean())

    # threshold above every sample: reference falls back to the plain mean
    cfg_hi = TrainConfig(kd_lambda=0.1, lr=1e-3, threshold_byloss=True, threshold=float(per.max() + 1))
    step_hi = make_train_step(model, teacher, make_optimizer(cfg_hi), cfg_hi, donate=False)
    _, m_hi = step_hi(state, mixj, srcj)
    np.testing.assert_allclose(float(m_hi["loss"]), per.mean(), rtol=2e-3)

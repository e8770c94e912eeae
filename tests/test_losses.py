"""Loss-stack tests: pairwise SI-SDR matrix vs torch oracle, PIT, KD weights."""

import numpy as np

import jax.numpy as jnp

import torch

from fqss_tpu.separation.losses import (
    fqss_kd_loss,
    kd_sensitivity_weights,
    music_kd_l1_loss,
    nsdr_db,
    pairwise_sisdr_ratio,
    pit_neg_sisdr_db,
    pit_wsisdr_ratio,
)


def torch_pairwise_wsisdr(est, targets, weights=None, eps=1e-8):
    """Oracle transcription of PairwiseWSDR('sisdr', take_log=False)
    (asteroid_librimix/wsdr.py:46-95)."""
    targets = targets - targets.mean(dim=2, keepdim=True)
    est = est - est.mean(dim=2, keepdim=True)
    s_target = targets.unsqueeze(1)
    s_estimate = est.unsqueeze(2)
    dot = torch.sum(s_estimate * s_target, dim=3, keepdim=True)
    energy = torch.sum(s_target**2, dim=3, keepdim=True) + eps
    proj = dot * s_target / energy
    e_noise = s_estimate - proj
    pw = torch.sum(proj**2, dim=3) / (torch.sum(e_noise**2, dim=3) + eps)
    if weights is not None:
        pw = pw * weights[:, None, None]
    return -pw


def test_pairwise_matrix_matches_torch_oracle():
    rng = np.random.default_rng(0)
    est = rng.standard_normal((3, 2, 500)).astype(np.float32)
    tgt = rng.standard_normal((3, 2, 500)).astype(np.float32)
    got = -pairwise_sisdr_ratio(jnp.asarray(est), jnp.asarray(tgt))
    want = torch_pairwise_wsisdr(torch.tensor(est), torch.tensor(tgt)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-6)


def test_pit_finds_best_permutation():
    rng = np.random.default_rng(1)
    tgt = rng.standard_normal((2, 3, 400)).astype(np.float32)
    est = tgt[:, [2, 0, 1], :]  # permuted perfect estimates
    loss = pit_neg_sisdr_db(jnp.asarray(est), jnp.asarray(tgt))
    assert float(loss) < -60  # perfect reconstruction under the right perm

    # Wrong-perm loss would be terrible; PIT must not pick it.
    per_sample = pit_neg_sisdr_db(jnp.asarray(est), jnp.asarray(tgt), per_sample=True)
    assert per_sample.shape == (2,)
    assert (np.asarray(per_sample) < -60).all()


def test_weighted_pit_scales_with_weights():
    rng = np.random.default_rng(2)
    tgt = rng.standard_normal((2, 2, 300)).astype(np.float32)
    est = tgt + 0.1 * rng.standard_normal((2, 2, 300)).astype(np.float32)
    w1 = jnp.ones((2,))
    base = pit_wsisdr_ratio(jnp.asarray(est), jnp.asarray(tgt), weights=w1)
    doubled = pit_wsisdr_ratio(jnp.asarray(est), jnp.asarray(tgt), weights=2 * w1)
    np.testing.assert_allclose(float(doubled), 2 * float(base), rtol=1e-5)


def test_kd_weights_one_when_student_equals_teacher():
    rng = np.random.default_rng(3)
    tgt = rng.standard_normal((2, 2, 300)).astype(np.float32)
    est = tgt + 0.05 * rng.standard_normal((2, 2, 300)).astype(np.float32)
    w = kd_sensitivity_weights(jnp.asarray(est), jnp.asarray(est), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(w), np.ones(2), rtol=1e-5)


def test_fqss_kd_loss_finite_and_better_for_better_student():
    rng = np.random.default_rng(4)
    tgt = rng.standard_normal((2, 2, 400)).astype(np.float32)
    fest = tgt + 0.05 * rng.standard_normal((2, 2, 400)).astype(np.float32)
    good = tgt + 0.05 * rng.standard_normal((2, 2, 400)).astype(np.float32)
    bad = tgt + 0.5 * rng.standard_normal((2, 2, 400)).astype(np.float32)
    loss_good, kd_good = fqss_kd_loss(jnp.asarray(good), jnp.asarray(fest), jnp.asarray(tgt), kd_lambda=0.1)
    loss_bad, _ = fqss_kd_loss(jnp.asarray(bad), jnp.asarray(fest), jnp.asarray(tgt), kd_lambda=0.1)
    assert np.isfinite(float(loss_good)) and np.isfinite(float(loss_bad))
    assert float(loss_good) < float(loss_bad)
    # kd_lambda=0 -> plain PIT neg-SI-SDR
    loss0, kd0 = fqss_kd_loss(jnp.asarray(good), jnp.asarray(fest), jnp.asarray(tgt), kd_lambda=0.0)
    want = pit_neg_sisdr_db(jnp.asarray(good), jnp.asarray(tgt))
    np.testing.assert_allclose(float(loss0), float(want), rtol=1e-6)
    assert float(kd0) == 0.0


def test_nsdr_matches_reference_formula():
    rng = np.random.default_rng(5)
    ref = rng.standard_normal((3, 1000)).astype(np.float32)
    sig = ref + 0.1 * rng.standard_normal((3, 1000)).astype(np.float32)
    got = nsdr_db(jnp.asarray(ref), jnp.asarray(sig))
    want = 10 * np.log10((np.sum(ref**2, 1) + 1e-7) / (np.sum((ref - sig) ** 2, 1) + 1e-7))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_music_kd_l1_loss():
    rng = np.random.default_rng(6)
    src = rng.standard_normal((2, 4, 2, 500)).astype(np.float32)
    wavs = src + 0.1 * rng.standard_normal(src.shape).astype(np.float32)
    fwavs = src + 0.02 * rng.standard_normal(src.shape).astype(np.float32)
    for kind in ("pow10", "exp"):
        loss = music_kd_l1_loss(jnp.asarray(wavs), jnp.asarray(fwavs), jnp.asarray(src), 0.1, kind)
        assert np.isfinite(float(loss)) and float(loss) > 0
    plain = music_kd_l1_loss(jnp.asarray(wavs), jnp.asarray(fwavs), jnp.asarray(src), 0.0)
    np.testing.assert_allclose(float(plain), np.mean(np.abs(wavs - src)), rtol=1e-5)

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


def _torch_tasnet_music_loss(wavs, fwavs, sources, kd_lambda, eps=1e-7):
    """Oracle transcription of the tasnet music KD loop
    (musdbhq_train.py:87-107 + process.py:70-75 calc_nsdr), incl. the
    reference's calc_nsdr(ESTIMATE, sources) argument order."""
    loss_fn = torch.nn.L1Loss()

    def calc_nsdr(ref, sig):
        sdr = (torch.sum(torch.square(ref)) + eps) / (torch.sum(torch.square(ref - sig)) + eps)
        return 10 * np.log10(sdr.item())

    sdrs, sdrqs = [], []
    for i in range(len(fwavs)):
        sdrs.append(calc_nsdr(fwavs[i : i + 1], sources[i : i + 1]))
        sdrqs.append(calc_nsdr(wavs[i : i + 1], sources[i : i + 1]))
    w = 10 ** ((torch.tensor(sdrs) - torch.tensor(sdrqs)) / 10)
    kd_losses = [loss_fn(wavs[i : i + 1], fwavs[i : i + 1]) for i in range(len(fwavs))]
    kd_loss = torch.mean(w * torch.stack(kd_losses))
    task_loss = loss_fn(wavs, sources)
    return (1 - kd_lambda) * task_loss + kd_lambda * kd_loss


def _torch_htdemucs_loss(wavs, fwavs, sources, kd_lambda, weights, eps=1e-7):
    """Oracle transcription of the htdemucs solver KD branch
    (solver.py:334-372; new_sdr per demucs: ref=sources, per-source)."""
    dims = tuple(range(2, sources.dim()))

    def new_sdr(ref, est):
        num = torch.sum(torch.square(ref), dim=(2, 3)) + eps
        den = torch.sum(torch.square(ref - est), dim=(2, 3)) + eps
        return 10 * torch.log10(num / den)

    sdrs = torch.cat([new_sdr(sources[i : i + 1], fwavs[i : i + 1]) for i in range(len(fwavs))])
    sdrqs = torch.cat([new_sdr(sources[i : i + 1], wavs[i : i + 1]) for i in range(len(wavs))])
    w = torch.exp((sdrs - sdrqs) / 10)
    task = torch.nn.functional.l1_loss(wavs, sources, reduction="none").mean(dims).mean(0)
    kd = torch.nn.functional.l1_loss(wavs, fwavs, reduction="none").mean(dims)
    kd = torch.mean(w * kd, dim=0)
    loss = (1 - kd_lambda) * task + kd_lambda * kd
    weights = torch.tensor(weights)
    return (loss * weights).sum() / weights.sum()


def test_music_kd_l1_loss_pow10_matches_tasnet_oracle():
    rng = np.random.default_rng(6)
    src = rng.standard_normal((3, 4, 2, 500)).astype(np.float32)
    wavs = src + 0.1 * rng.standard_normal(src.shape).astype(np.float32)
    fwavs = src + 0.02 * rng.standard_normal(src.shape).astype(np.float32)
    got = music_kd_l1_loss(jnp.asarray(wavs), jnp.asarray(fwavs), jnp.asarray(src), 0.1, "pow10")
    want = _torch_tasnet_music_loss(
        torch.tensor(wavs), torch.tensor(fwavs), torch.tensor(src), 0.1
    )
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_music_kd_l1_loss_exp_matches_htdemucs_oracle():
    rng = np.random.default_rng(7)
    src = rng.standard_normal((3, 4, 2, 400)).astype(np.float32)
    wavs = src + 0.15 * rng.standard_normal(src.shape).astype(np.float32)
    fwavs = src + 0.03 * rng.standard_normal(src.shape).astype(np.float32)
    for weights in ([1.0, 1.0, 1.0, 1.0], [1.0, 2.0, 0.5, 1.5]):
        got = music_kd_l1_loss(
            jnp.asarray(wavs), jnp.asarray(fwavs), jnp.asarray(src), 0.1, "exp",
            source_weights=jnp.asarray(weights, jnp.float32),
        )
        want = _torch_htdemucs_loss(
            torch.tensor(wavs), torch.tensor(fwavs), torch.tensor(src), 0.1, weights
        )
        np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_music_kd_l1_loss_no_kd():
    rng = np.random.default_rng(8)
    src = rng.standard_normal((2, 4, 2, 300)).astype(np.float32)
    wavs = src + 0.1 * rng.standard_normal(src.shape).astype(np.float32)
    fwavs = src
    plain = music_kd_l1_loss(jnp.asarray(wavs), jnp.asarray(fwavs), jnp.asarray(src), 0.0)
    np.testing.assert_allclose(float(plain), np.mean(np.abs(wavs - src)), rtol=1e-5)

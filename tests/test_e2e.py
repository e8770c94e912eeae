"""End-to-end slice: synthesize a mini LibriMix on disk, run the full speech
QAT recipe (train.py path), then the val and infer paths — the integration
test the reference never had (SURVEY.md §4)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from fqss_tpu.data.librimix import LibriMix, batch_iterator, make_mini_librimix

TINY_ARCH = dict(n_filters=32, bn_chan=8, hid_chan=16, n_blocks=2, n_repeats=1)


def _smoke_conf(root, train_dir, val_dir):
    return {
        "work_dir": os.path.join(root, "work"),
        "model_cfg": {
            "name": "ConvTasNet",
            "model_path": None,
            "n_src": 2,
            "kernel_size": 16,
            "stride": 8,
            **TINY_ARCH,
            "quantization": {
                "qat": True, "gradient_based": True,
                "weight_quant": True, "weight_n_bits": 8,
                "act_quant": True, "act_n_bits": 8,
                "in_quant": False, "out_quant": True, "out_act_n_bits": 8,
                "n_splitter": 2, "n_combiner": 2,
                "observer": True,
            },
        },
        "dataset_cfg": {
            "name": "librimix", "task": "sep_clean",
            "train_dir": train_dir, "valid_dir": val_dir,
            "sample_rate": 8000, "resample": 1.0, "n_src": 2, "noisy": False,
            "segment": 0.5,
            "augmentation": {"enable": False},
        },
        "training_cfg": {
            "epochs": 2, "batch_size": 2, "half_lr": True, "early_stop": True,
            # time-based mid-epoch checkpointing (speechbrain
            # ckpt_interval_minutes); tiny interval -> fires on every batch
            "ckpt_interval_minutes": 1e-6,
            "pretrained": None, "seed": 0, "kd_lambda": 0.1,
            "optim": {"optimizer": "adam", "lr": 0.001, "weight_decay": 0.0},
        },
        "testing_cfg": {"test_dir": None, "overlap": 0.25},
    }


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("minilibrimix"))
    train_dir, val_dir = make_mini_librimix(root, n_train=6, n_val=2, sample_rate=8000, seconds=0.6)
    return root, train_dir, val_dir


def test_librimix_dataset_and_iterator(mini_dataset):
    _, train_dir, _ = mini_dataset
    ds = LibriMix(train_dir, task="sep_clean", sample_rate=8000, n_src=2, segment=0.5)
    assert len(ds) == 6
    mix, src = ds[0]
    assert mix.shape == (4000,) and src.shape == (2, 4000)
    batches = list(batch_iterator(ds, batch_size=2, seed=0))
    assert len(batches) == 3
    assert batches[0][0].shape == (2, 4000) and batches[0][1].shape == (2, 2, 4000)


def test_librimix_augmentation(mini_dataset):
    _, train_dir, _ = mini_dataset
    aug = {"enable": True, "distribution": "uniform", "param0": -5, "param1": 5, "prob": 1.0}
    ds = LibriMix(train_dir, task="sep_clean", sample_rate=8000, n_src=2, segment=0.5, augmentation_cfg=aug)
    mix, src = ds[0]
    # augmented mixture is a re-gained sum, not the stored mixture
    assert np.abs(mix).max() <= 0.9 + 1e-6
    assert mix.shape == (4000,)


def test_librimix_speed_perturb(mini_dataset):
    """speechbrain speed-perturb: per-source random-speed resample, mixture
    re-summed from the perturbed sources (speechbrain_librimix_trainer.py:52-57)."""
    _, train_dir, _ = mini_dataset
    ds = LibriMix(train_dir, task="sep_clean", sample_rate=8000, n_src=2, segment=0.5,
                  speed_perturb=True, seed=3)
    base = LibriMix(train_dir, task="sep_clean", sample_rate=8000, n_src=2, segment=0.5, seed=3)
    changed = False
    for i in range(len(ds)):
        mix, src = ds[i]
        assert mix.shape == (4000,) and src.shape == (2, 4000)
        # invariant: the mixture is exactly the sum of the (perturbed) sources
        np.testing.assert_allclose(mix, src.sum(0), atol=1e-6)
        _, src0 = base[i]
        if not np.allclose(src, src0):
            changed = True
    assert changed  # at least one draw actually perturbed a source


def test_librimix_rand_shift_and_wavedrop(mini_dataset):
    """speechbrain use_rand_shift / use_wavedrop
    (speechbrain_librimix_trainer.py:70-72,284-295): rand_shift circularly
    rolls each source (mix re-summed, energy preserved); wavedrop
    notch-filters + chunk-drops the MIXTURE only (sources untouched)."""
    _, train_dir, _ = mini_dataset
    base = LibriMix(train_dir, task="sep_clean", sample_rate=8000, n_src=2, segment=0.5, seed=7)
    rs = LibriMix(train_dir, task="sep_clean", sample_rate=8000, n_src=2, segment=0.5,
                  rand_shift=True, shift_range=(-500, 500), seed=7)
    mix, src = rs[0]
    np.testing.assert_allclose(mix, src.sum(0), atol=1e-6)  # mix re-summed
    _, src0 = base[0]
    assert not np.allclose(src, src0)  # actually rolled
    np.testing.assert_allclose(  # circular shift preserves energy
        np.sum(src**2, -1), np.sum(src0**2, -1), rtol=1e-5)

    wd = LibriMix(train_dir, task="sep_clean", sample_rate=8000, n_src=2, segment=0.5,
                  wavedrop=True, seed=7)
    mix_wd, src_wd = wd[0]
    np.testing.assert_allclose(src_wd, src0, atol=1e-6)  # sources untouched
    assert not np.allclose(mix_wd, src_wd.sum(0))  # mixture filtered/dropped
    assert np.sum(mix_wd == 0.0) >= 100  # drop_chunk zeroed at least one chunk


def test_drop_freq_notch_attenuates_target_band():
    from fqss_tpu.data.augment import _notch_kernel

    # The kernel's sinc(3(f±w)n) construction puts the notch center at
    # angular frequency 3*(f+w) rad/sample (the +w shift mirrors the
    # speechbrain notch_filter). A probe tone there must be strongly
    # attenuated; a far-away tone must survive.
    f, w = 0.5, 0.05
    kern = _notch_kernel(f, width=w)
    n = np.arange(4000)
    probe = np.sin(3.0 * (f + w) * n).astype(np.float32)
    far = np.sin(0.3 * n).astype(np.float32)
    att_probe = np.std(np.convolve(probe, kern, "same")) / np.std(probe)
    att_far = np.std(np.convolve(far, kern, "same")) / np.std(far)
    assert att_probe < 0.2, att_probe
    assert att_far > 0.8, att_far


@pytest.mark.slow
def test_train_speech_recipe_end_to_end(mini_dataset):
    root, train_dir, val_dir = mini_dataset
    conf = _smoke_conf(root, train_dir, val_dir)
    from fqss_tpu.train.recipes import train_speech

    result = train_speech(conf, env_name="asteroid")
    assert np.isfinite(result["best_val_loss"])
    work = conf["work_dir"]
    assert os.path.exists(os.path.join(work, "conf.yml"))
    assert os.path.exists(os.path.join(work, "best_model.npz"))
    assert os.path.exists(os.path.join(work, "latest_model.npz"))
    assert os.path.exists(os.path.join(work, "results.txt"))
    assert "interval checkpoint" in open(os.path.join(work, "results.txt")).read()
    hist = json.load(open(os.path.join(work, "history.json")))
    assert len(hist) == 2

    # --- val path: reload the exported model and evaluate programmatically
    from fqss_tpu.models.factory import create_pretrained_model

    model_cfg = dict(conf["model_cfg"])
    model_cfg["model_path"] = os.path.join(work, "best_model.npz")
    example = jnp.zeros((1, 4000), jnp.float32)
    model, variables = create_pretrained_model(model_cfg, example, observer=False)

    import jax

    apply_fn = jax.jit(lambda x: model.apply(variables, x))
    from fqss_tpu.separation.ola import ola_infer

    mix, _ = LibriMix(val_dir, task="sep_clean", sample_rate=8000, n_src=2, segment=None)[0]
    out = ola_infer(apply_fn, mix[None, :], n_srcs=2, segment=4000, overlap=0.25)
    assert out.shape == (2, mix.shape[-1])
    assert np.isfinite(out).all()


def test_cli_help_surfaces():
    """The three CLIs exist with the reference's flags."""
    for cli, flags in (("train.py", "-env"), ("val.py", "-y"), ("infer.py", "-a")):
        proc = subprocess.run(
            [sys.executable, cli, "--help"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert proc.returncode == 0, proc.stderr
        assert flags in proc.stdout


def test_config_loader_reference_schema(tmp_path):
    from fqss_tpu.utils.config import load_config_str

    conf = load_config_str(
        """
work_dir: /tmp/x
batch_size: 4
lr: 0.001
model_cfg:
  n_src: 2
num_spks: !ref <model_cfg[n_src]>
train_log: !ref <work_dir>/train_log.txt
opt: !name:torch.optim.Adam
  lr: !ref <lr>
dataloader_opts:
  batch_size: !ref <batch_size>
"""
    )
    assert conf["num_spks"] == 2
    assert conf["train_log"] == "/tmp/x/train_log.txt"
    assert conf["opt"]["_target_"] == "torch.optim.Adam"
    assert conf["opt"]["lr"] == 0.001
    assert conf["dataloader_opts"]["batch_size"] == 4


@pytest.mark.slow
def test_train_speech_mse_quantizer_end_to_end(mini_dataset):
    """act_quantizer: 'mse' trains, calibrates at the observer-window close,
    and actually engages quantization (the reference self-calibrates inline,
    qat_quant.py:306-326; round-3 gap: the calibration pass was never called
    from the product training path)."""
    root, train_dir, val_dir = mini_dataset
    conf = _smoke_conf(root, train_dir, val_dir)
    conf["work_dir"] = os.path.join(root, "work_mse")
    conf["model_cfg"] = dict(conf["model_cfg"])
    conf["model_cfg"]["quantization"] = dict(
        conf["model_cfg"]["quantization"], act_quantizer="mse", max_observations=4
    )
    from fqss_tpu.train.recipes import train_speech

    result = train_speech(conf, env_name="asteroid")
    assert np.isfinite(result["best_val_loss"])
    with open(os.path.join(conf["work_dir"], "results.txt")) as f:
        assert "MSE quantizer calibration" in f.read()

    # Every MSE quantizer calibrated; ranges moved off the (-0.5, 0.5) inits.
    state = result["state"]
    calibrated, moved = [], []

    def walk(stats, params):
        for k, v in stats.items():
            if isinstance(v, dict) and "hist" in v:
                calibrated.append(bool(np.asarray(v["calibrated"])))
                p = params[k]
                moved.append(
                    float(p["min_range"][0]) != -0.5 or float(p["max_range"][0]) != 0.5
                )
            elif isinstance(v, dict):
                walk(v, params.get(k, {}))

    walk(state.qstats, state.qparams)
    assert calibrated and all(calibrated)
    assert any(moved)

    # Quantization engages post-calibration: the loaded model's forward
    # differs from the float-branch forward the uncalibrated state produces.
    import jax

    from fqss_tpu.models.factory import create_pretrained_model

    model_cfg = dict(conf["model_cfg"])
    model_cfg["model_path"] = os.path.join(conf["work_dir"], "best_model.npz")
    example = jnp.zeros((1, 4000), jnp.float32)
    # observer stays True: post-calibration the quantize branch engages, and
    # clearing the calibrated flag restores the float passthrough — the pair
    # proves the flag actually gates quantization.
    model, variables = create_pretrained_model(model_cfg, example)
    mix, _ = LibriMix(val_dir, task="sep_clean", sample_rate=8000, n_src=2, segment=0.5)[0]
    est = model.apply(variables, jnp.asarray(mix)[None])
    # un-calibrate: flip the flags back -> the float passthrough branch
    uncal = jax.tree_util.tree_map(lambda a: a, variables)
    def clear(node):
        for v in node.values():
            if isinstance(v, dict) and "calibrated" in v:
                v["calibrated"] = np.asarray(False)
            elif isinstance(v, dict):
                clear(v)
    clear(uncal["qstats"])
    est_float = model.apply(uncal, jnp.asarray(mix)[None])
    assert not np.allclose(np.asarray(est), np.asarray(est_float))


@pytest.mark.slow
def test_train_speech_resume_from_checkpoint(mini_dataset):
    """observer=False resumes from the work_dir checkpoint (the reference's
    resume semantics, configs/convtasnet_2spks_8k.yaml:26)."""
    root, train_dir, val_dir = mini_dataset
    conf = _smoke_conf(root, train_dir, val_dir)
    conf["work_dir"] = os.path.join(root, "work_resume")
    from fqss_tpu.train.recipes import train_speech

    r1 = train_speech(conf, env_name="asteroid")
    assert r1["epochs_run"] == 2

    # resume: observer False, more epochs
    conf2 = dict(conf)
    conf2["model_cfg"] = dict(conf["model_cfg"])
    conf2["model_cfg"]["quantization"] = dict(conf["model_cfg"]["quantization"], observer=False)
    conf2["training_cfg"] = dict(conf["training_cfg"], epochs=3)
    r2 = train_speech(conf2, env_name="asteroid")
    hist = json.load(open(os.path.join(conf["work_dir"], "history.json")))
    epochs_seen = [h["epoch"] for h in hist]
    assert 2 in epochs_seen  # the resumed run added epoch 2 only
    with open(os.path.join(conf["work_dir"], "results.txt")) as f:
        assert "resumed from checkpoint" in f.read()

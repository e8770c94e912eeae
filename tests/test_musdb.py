"""MUSDB data layer + music recipe end-to-end tests (synthetic mini-MUSDB)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.data.musdb import Wavset, augment_batch, build_metadata, get_musdb_wav_datasets, make_mini_musdb

SOURCES = ("drums", "bass", "other", "vocals")


@pytest.fixture(scope="module")
def mini_musdb(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("musdb"))
    return make_mini_musdb(root, n_train=3, n_test=2, sample_rate=8000, seconds=1.0)


def test_build_metadata_and_wavset(mini_musdb):
    meta = build_metadata(os.path.join(mini_musdb, "train"), SOURCES)
    assert len(meta) == 3
    m0 = next(iter(meta.values()))
    assert m0["samplerate"] == 8000 and m0["length"] == 8000

    ws = Wavset(os.path.join(mini_musdb, "train"), meta, SOURCES, length=4000, stride=2000, sample_rate=8000)
    assert len(ws) == 3 * 3  # ceil((8000-4000)/2000)+1 = 3 windows per track
    ex = ws[0]
    assert ex.shape == (4, 2, 4000)


def test_get_musdb_wav_datasets_split(mini_musdb, tmp_path):
    meta_file = str(tmp_path / "musdbhq.json")
    train_set, valid_set = get_musdb_wav_datasets(
        mini_musdb, data_stride=2000, sample_rate=8000, samples=4000,
        sources=SOURCES, metadata_file=meta_file,
    )
    assert os.path.exists(meta_file)
    assert len(train_set) > 0 and len(valid_set) > 0
    val0 = valid_set[0]
    assert val0.shape[0] == 5  # mixture + 4 stems


def test_augment_batch_semantics():
    rng = jax.random.PRNGKey(0)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((4, 4, 2, 1000)).astype(np.float32))
    out = augment_batch(rng, wav, shift=100, remix_group_size=4)
    assert out.shape == (4, 4, 2, 900)
    assert bool(jnp.isfinite(out).all())
    # deterministic per key
    out2 = augment_batch(rng, wav, shift=100, remix_group_size=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # energy is preserved per (batch,source) up to the scale augment range
    no_scale = augment_batch(rng, wav, shift=0, scale=None, remix_group_size=0)
    np.testing.assert_allclose(
        np.sort(np.abs(np.asarray(no_scale)).sum((2, 3)).ravel()),
        np.sort(np.abs(np.asarray(wav)).sum((2, 3)).ravel()),
        rtol=1e-5,
    )


@pytest.mark.slow
def test_music_recipe_end_to_end(mini_musdb, tmp_path):
    conf = {
        "work_dir": str(tmp_path / "work"),
        "model_cfg": {
            "name": "ConvTasNetMusic",
            "sources": list(SOURCES),
            "audio_channels": 2,
            "n_filters": 16, "kernel_size": 20, "stride": 10,
            "bn_chan": 8, "hid_chan": 16, "n_blocks": 2, "n_repeats": 1,
            "quantization": {
                "qat": True, "observer": True, "n_splitter": 2, "n_combiner": 2,
                "out_quant": True,
            },
        },
        "dataset_cfg": {
            "musdb_root": mini_musdb,
            "sample_rate": 8000,
            "segment": 0.5,
            "data_stride": 0.25,
            "augmentation": {"enable": True, "shift": 80, "remix_group_size": 2},
        },
        "training_cfg": {
            "epochs": 2, "batch_size": 2, "kd_lambda": 0.1, "seed": 0,
            "optim": {"lr": 1e-3},
        },
        "testing_cfg": {"test_dir": mini_musdb, "overlap": 0.25, "segment_samples": 4000},
    }
    from fqss_tpu.train.recipes_music import train_tasnet_music

    result = train_tasnet_music(conf)
    assert np.isfinite(result["best_loss"])
    assert os.path.exists(os.path.join(conf["work_dir"], "best_model.npz"))

    # musdb NSDR validation over the synthetic test split
    from fqss_tpu.models.factory import create_pretrained_model
    from fqss_tpu.train.validate_musdb import val_musdbhq, val_musdbhq_nsdr

    model_cfg = dict(conf["model_cfg"])
    model_cfg["model_path"] = os.path.join(conf["work_dir"], "best_model.npz")
    example = jnp.zeros((1, 2, 4000), jnp.float32)
    model, variables = create_pretrained_model(model_cfg, example, observer=False)
    vals = val_musdbhq_nsdr(model, variables, model_cfg, conf["testing_cfg"], limit=1)
    assert len(vals) == 5 and np.isfinite(vals[0])
    sdr_vals = val_musdbhq(model, variables, model_cfg, conf["testing_cfg"], limit=1)
    assert len(sdr_vals) == 5 and np.isfinite(sdr_vals[0])


def test_hydra_compat_maps_reference_htdemucs_schema():
    """The reference hydra config (configs/htdemucs.yaml: dset/optim/augment/
    ema/test top-level groups) maps onto the plain schema."""
    from fqss_tpu.train.recipes_music import _hydra_compat

    conf = {
        "work_dir": "/tmp/x",
        "model_cfg": {"name": "HTDemucs", "quantization": {"qat": True}},
        "dataset_cfg": {"name": "musdbhq"},
        "testing_cfg": {"test_dir": "/d", "segment_samples": 343980, "overlap": 0.25},
        "dset": {"musdb": "/storage/musdb18hq", "samplerate": 44100, "segment": 10,
                  "shift": 1, "channels": 2, "metadata": "/nonexistent/meta.json",
                  "sources": ["drums", "bass", "other", "vocals"]},
        "epochs": 90, "batch_size": 32, "kd_lambda": 0.1, "seed": 42,
        "weights": [1.0, 1.0, 1.0, 1.0],
        "optim": {"lr": 3e-4, "momentum": 0.9, "beta2": 0.999, "loss": "l1",
                   "optim": "adam", "weight_decay": 0, "clip_grad": 0},
        "augment": {"shift_same": False, "repitch": {"proba": 0.2, "max_tempo": 12},
                     "remix": {"proba": 1, "group_size": 4},
                     "scale": {"proba": 1, "min": 0.25, "max": 1.25}, "flip": True},
        "ema": {"epoch": [0.9, 0.95], "batch": [0.9995, 0.9999]},
        "test": {"every": 20, "best": True, "metric": "loss"},
        "pretrained": "/some/float.pth",
    }
    out = _hydra_compat(conf)
    ds, tc, mc = out["dataset_cfg"], out["training_cfg"], out["model_cfg"]
    assert ds["musdb_root"] == "/storage/musdb18hq"
    assert ds["segment"] == 10 and ds["data_stride"] == 1
    assert ds["augmentation"]["shift"] == 44100
    assert ds["augmentation"]["remix_group_size"] == 4
    assert ds["augmentation"]["repitch"]["proba"] == 0.2
    assert mc["sources"][0] == "drums" and mc["audio_channels"] == 2
    assert tc["epochs"] == 90 and tc["batch_size"] == 32 and tc["seed"] == 42
    assert tc["optim"]["lr"] == 3e-4 and tc["optim"]["optimizer"] == "adam"
    assert tc["ema"]["batch"] == [0.9995, 0.9999]
    assert tc["test"]["every"] == 20
    assert tc["pretrained"] == "/some/float.pth"
    # plain-schema configs pass through untouched
    plain = {"work_dir": "/x", "model_cfg": {}, "dataset_cfg": {"musdb_root": "/d"}}
    assert _hydra_compat(plain) is plain


@pytest.mark.slow
def test_music_recipe_accepts_reference_config_spelling(mini_musdb, tmp_path):
    """A reference YAML (configs/convtasnet_music.yaml) runs unchanged:
    train_dir/metadata/segment_samples keys and data_stride in samples."""
    conf = {
        "work_dir": str(tmp_path / "work_ref"),
        "model_cfg": {
            "name": "ConvTasNetMusic",
            "sources": list(SOURCES),
            "audio_channels": 2,
            "n_filters": 16, "kernel_size": 20, "stride": 10,
            "bn_chan": 8, "hid_chan": 16, "n_blocks": 2, "n_repeats": 1,
            "quantization": {"qat": True, "observer": True},
        },
        "dataset_cfg": {
            "train_dir": mini_musdb,          # reference spelling of musdb_root
            "metadata": None,                  # reference spelling of metadata_file
            "sample_rate": 8000,
            "segment_samples": 4000,           # reference: samples, not seconds
            "data_stride": 2000,               # reference: samples (>=1000)
            "augmentation": {"enable": False},
        },
        "training_cfg": {"epochs": 1, "batch_size": 2, "kd_lambda": 0.1, "seed": 0,
                          "optim": {"lr": 1e-3}},
        "testing_cfg": {"test_dir": mini_musdb, "overlap": 0.25, "segment_samples": 4000},
    }
    from fqss_tpu.train.recipes_music import train_tasnet_music

    result = train_tasnet_music(conf)
    assert np.isfinite(result["best_loss"])


def test_repitched_wavset_static_shape(mini_musdb):
    from fqss_tpu.data.musdb import RepitchedWavset, build_metadata

    meta = build_metadata(os.path.join(mini_musdb, "train"), SOURCES)
    ws = Wavset(os.path.join(mini_musdb, "train"), meta, SOURCES, length=4000, stride=2000, sample_rate=8000)
    rp = RepitchedWavset(ws, proba=1.0, max_pitch=2, max_tempo=12.0, seed=0)
    assert rp.out_length == int(0.88 * 4000)
    assert len(rp) == len(ws)
    seen_change = False
    for i in range(len(rp)):
        ex = rp[i]
        assert ex.shape == (4, 2, rp.out_length)  # static across draws
        assert np.isfinite(ex).all()
        if not np.allclose(ex, ws[i][..., : rp.out_length]):
            seen_change = True
    assert seen_change


def test_make_music_optimizer_groups():
    """Per-module optim groups (train.py:88-119): the crosstransformer
    subtree gets its own lr, everything else the base lr."""
    import optax

    from fqss_tpu.train.recipes_music import make_music_optimizer
    from fqss_tpu.train.trainer import TrainConfig

    trainable = {
        "params": {
            "encoder_0": {"w": jnp.ones((4,))},
            "crosstransformer": {"layer_0": {"w": jnp.ones((4,))}},
        },
        "qparams": {"crosstransformer": {"layer_0": {"min_range": jnp.ones((1,))}}},
    }
    cfg = TrainConfig(lr=1.0, grad_clip=0.0, weight_decay=0.0)
    tx = make_music_optimizer(cfg, {"t_lr": 0.1, "t_weight_decay": 0.0}, trainable)
    opt_state = tx.init(trainable)
    grads = jax.tree_util.tree_map(jnp.ones_like, trainable)
    updates, _ = tx.update(grads, opt_state, trainable)
    # adam first step: update magnitude == lr (bias-corrected m/sqrt(v) = 1)
    base_u = float(np.abs(updates["params"]["encoder_0"]["w"][0]))
    t_u = float(np.abs(updates["params"]["crosstransformer"]["layer_0"]["w"][0]))
    tq_u = float(np.abs(updates["qparams"]["crosstransformer"]["layer_0"]["min_range"][0]))
    np.testing.assert_allclose(base_u, 1.0, rtol=1e-4)
    np.testing.assert_allclose(t_u, 0.1, rtol=1e-4)
    np.testing.assert_allclose(tq_u, 0.1, rtol=1e-4)

    # without t_lr/t_weight_decay the plain optimizer is used
    tx2 = make_music_optimizer(cfg, {}, trainable)
    u2, _ = tx2.update(grads, tx2.init(trainable), trainable)
    np.testing.assert_allclose(
        float(np.abs(u2["params"]["crosstransformer"]["layer_0"]["w"][0])), 1.0, rtol=1e-4
    )


@pytest.mark.slow
def test_htdemucs_solver_parity_end_to_end(mini_musdb, tmp_path):
    """The htdemucs recipe runs the full solver behavior set: repitch-wrapped
    train set, batch+epoch EMA models validated each epoch with best-state
    selection (solver.py:52-58,220-236), periodic test eval (solver.py:262-287),
    checkpoint packages with EMA states, and resume with history replay."""
    conf = {
        "work_dir": str(tmp_path / "work_htd"),
        "model_cfg": {
            "name": "HTDemucs",
            "sources": list(SOURCES),
            "audio_channels": 2,
            "channels": 8, "nfft": 512, "t_layers": 3, "t_heads": 4,
            "segment": 0.5, "samplerate": 8000,
            "quantization": {"qat": True, "observer": True, "n_splitter": 1, "n_combiner": 1},
        },
        "dataset_cfg": {
            "musdb_root": mini_musdb,
            "sample_rate": 8000,
            "segment": 0.5,
            "data_stride": 0.25,
            "augmentation": {
                "enable": True, "shift": 80, "remix_group_size": 2,
                "repitch": {"proba": 1.0, "max_tempo": 12},
            },
        },
        "training_cfg": {
            "epochs": 2, "batch_size": 2, "kd_lambda": 0.0, "seed": 0,
            "optim": {"lr": 1e-3},
            "ema": {"batch": [0.5], "epoch": [0.5]},
            "test": {"every": 2, "metric": "loss", "best": True},
            "valid_limit": 1,
        },
        "testing_cfg": {"test_dir": mini_musdb, "overlap": 0.25, "segment_samples": 3520, "limit": 1},
    }
    from fqss_tpu.train.recipes_music import train_htdemucs

    result = train_htdemucs(conf)
    assert np.isfinite(result["best_loss"])
    # repitch wrapped the train set: the model saw the shrunk segment length
    assert result["state"].params  # trained
    # EMA zoo exists and the batch EMA drifted from init toward the params
    assert len(result["batch_emas"]) == 1 and len(result["epoch_emas"]) == 1
    assert result["bname"] in {"main", "ema_batch_0", "ema_epoch_0"}
    # periodic test ran (epoch 2 % every == 0 and last epoch)
    assert result["test"] is not None and np.isfinite(result["test"]["nsdr"])
    work = conf["work_dir"]
    assert os.path.exists(os.path.join(work, "best_model.npz"))

    # resume: one more epoch restores EMAs + best_state and replays history
    conf2 = dict(conf, training_cfg=dict(conf["training_cfg"], epochs=3))
    r2 = train_htdemucs(conf2)
    assert r2["epochs_run"] == 3
    with open(os.path.join(work, "results.txt")) as f:
        txt = f.read()
    assert "resumed from checkpoint" in txt and "replay epoch" in txt


def test_native_wav_segment_reader(tmp_path):
    from fqss_tpu.native import available, read_wav_segment, wav_info
    from fqss_tpu.utils.audio import read_audio, save_audio

    rng = np.random.default_rng(9)
    w = rng.uniform(-0.9, 0.9, (2, 16000)).astype(np.float32)
    p = str(tmp_path / "seg.wav")
    save_audio(p, w, 8000)
    frames, sr, ch = wav_info(p)
    assert (frames, sr, ch) == (16000, 8000, 2)
    seg, sr2 = read_wav_segment(p, 4000, 2000)
    ref, _ = read_audio(p)
    np.testing.assert_allclose(seg, ref[:, 4000:6000], atol=1e-4)
    # tail clamp: a request crossing EOF must return valid data for EVERY
    # channel (regression: the clamped frame count was used as the planar
    # channel stride, scattering channels 1+ across the caller's buffer)
    tail, _ = read_wav_segment(p, 15500, 2000)
    assert tail.shape == (2, 500)
    np.testing.assert_allclose(tail, ref[:, 15500:], atol=1e-4)


def test_native_wav_extensible_float(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE float32 (libsndfile-style) must decode as float,
    not be coerced to int PCM."""
    import struct

    from fqss_tpu.native import available, read_wav_segment, wav_info

    if not available():
        pytest.skip("native wavio unavailable")
    rng = np.random.default_rng(3)
    w = rng.uniform(-0.9, 0.9, (2, 1000)).astype(np.float32)
    interleaved = np.ascontiguousarray(w.T).tobytes()
    # KSDATAFORMAT_SUBTYPE_IEEE_FLOAT = {00000003-0000-0010-8000-00aa00389b71}
    sub_fmt = struct.pack("<IHH", 3, 0, 0x10) + bytes(
        [0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
    )
    # base fmt + extension: cbSize=22, valid bits=32, channel mask=0x3, GUID
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 2, 8000, 8000 * 8, 8, 32, 22, 32, 0x3) + sub_fmt
    p = tmp_path / "ext.wav"
    data = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data += b"data" + struct.pack("<I", len(interleaved)) + interleaved
    p.write_bytes(b"RIFF" + struct.pack("<I", len(data)) + data)

    frames, sr, ch = wav_info(str(p))
    assert (frames, sr, ch) == (1000, 8000, 2)
    seg, _ = read_wav_segment(str(p), 0, 1000)
    np.testing.assert_allclose(seg, w, atol=1e-6)


def test_hard_music_task_stems_are_timbre_identifiable():
    """The band_disjoint=False music task must make stem identity learnable
    from timbre (the music trainers have no PIT — fixed stem order), while
    the stems still share one wide frequency band. Checks the slot-wise
    signatures the generator promises: bass (slot 0) sits spectrally below
    vocal (slot 2); drums (slot 1) is far spikier than pad (slot 3); every
    stem has energy in the shared 200-800 Hz band."""
    from fqss_tpu.data.synthetic import synth_music_batch

    rng = np.random.default_rng(7)
    x = synth_music_batch(rng, 8, 4000, band_disjoint=False)  # [B, 4, 2, T]
    assert x.shape == (8, 4, 2, 4000) and np.isfinite(x).all()

    mono = x.mean(axis=2)  # [B, 4, T]
    spec = np.abs(np.fft.rfft(mono, axis=-1))  # [B, 4, F]
    freqs = np.fft.rfftfreq(4000, d=1 / 8000)
    centroid = (spec * freqs).sum(-1) / (spec.sum(-1) + 1e-9)  # [B, 4]
    assert (centroid[:, 0] < centroid[:, 2]).mean() > 0.9  # bass below vocal

    z = (mono - mono.mean(-1, keepdims=True)) / (mono.std(-1, keepdims=True) + 1e-9)
    kurt = (z**4).mean(-1)  # [B, 4]
    assert kurt[:, 1].mean() > 2.0 * kurt[:, 3].mean()  # drums spikier than pad

    band = (freqs >= 200) & (freqs <= 800)
    frac = spec[..., band].sum(-1) / (spec.sum(-1) + 1e-9)
    assert (frac > 0.02).all()  # spectral overlap: no stem avoids the shared band

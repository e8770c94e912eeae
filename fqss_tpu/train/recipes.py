"""Training recipes: the reference's four environments on one trainer.

``train_speech`` reproduces the asteroid recipe behavior
(reference: train_env/asteroid_librimix/asteroid_librimix_trainer.py:140-214)
and, with config flags, the speechbrain recipe's robustness knobs
(loss thresholding, nonfinite skip — speechbrain_librimix_trainer.py:140-197):
LibriMix data, KD-from-float-teacher QAT, ReduceLROnPlateau (half_lr),
EarlyStopping(30), grad-clip 5.0, best/latest checkpoint exports, conf.yml
dump, results.txt logging — all driven by the same YAML schema.

Data parallelism is implicit: batches are sharded over the device mesh and
the single jitted train step handles the rest (fqss_tpu.parallel).
"""

from __future__ import annotations

import os
import time
from typing import Any, Mapping

import numpy as np

import jax
import jax.numpy as jnp

from fqss_tpu.data.librimix import LibriMix, batch_iterator
from fqss_tpu.models.factory import create_model_and_teacher
from fqss_tpu.parallel import make_mesh, shard_batch
from fqss_tpu.parallel.mesh import replicated_sharding
from fqss_tpu.train.checkpoints import CheckpointManager, dump_config, export_model, save_log
from fqss_tpu.train.state import create_train_state
from fqss_tpu.train.trainer import (
    EarlyStopping,
    ReduceLROnPlateau,
    StepLR,
    TrainConfig,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from fqss_tpu.utils.audio import set_seed


def _make_datasets(
    dataset_cfg: Mapping[str, Any],
    seed: int,
    use_speedperturb: bool = False,
    use_rand_shift: bool = False,
    shift_range: tuple[int, int] = (-8000, 8000),
    use_wavedrop: bool = False,
):
    name = dataset_cfg.get("name", "librimix")
    if name == "librimix":
        common = dict(
            task=dataset_cfg.get("task", "sep_clean"),
            sample_rate=dataset_cfg.get("sample_rate", 16000),
            resample=dataset_cfg.get("resample", 1.0),
            n_src=dataset_cfg.get("n_src", 2),
            segment=dataset_cfg.get("segment", 3),
        )
        train_set = LibriMix(
            dataset_cfg["train_dir"],
            augmentation_cfg=dataset_cfg.get("augmentation"),
            speed_perturb=use_speedperturb,  # train-only (sb.Stage.TRAIN guard)
            rand_shift=use_rand_shift,
            shift_range=shift_range,
            wavedrop=use_wavedrop,
            seed=seed,
            **common,
        )
        val_set = LibriMix(dataset_cfg["valid_dir"], seed=seed + 1, **common)
        return train_set, val_set
    raise ValueError(f"Dataset {name} is not supported for the speech recipe")


def train_speech(conf: Mapping[str, Any], env_name: str = "asteroid") -> dict:
    """Run speech QAT training from a reference-schema config dict."""
    work_dir = conf["work_dir"]
    model_cfg = conf["model_cfg"]
    dataset_cfg = conf["dataset_cfg"]
    training_cfg = conf["training_cfg"]

    seed = training_cfg.get("seed", 0)
    set_seed(seed)
    dump_config(work_dir, dict(conf))

    # speechbrain env: the TimeDomainSpecAugment family on the training set
    # (speechbrain_librimix_trainer.py:52-72 use_speedperturb /
    # use_rand_shift / use_wavedrop; sepformer config defaults: True/False/
    # False, min_shift=-8000, max_shift=8000).
    is_sb = env_name == "speechbrain"
    use_sp = is_sb and training_cfg.get("use_speedperturb", True)
    use_rs = is_sb and training_cfg.get("use_rand_shift", False)
    use_wd = is_sb and training_cfg.get("use_wavedrop", False)
    shift_range = (training_cfg.get("min_shift", -8000), training_cfg.get("max_shift", 8000))
    train_set, val_set = _make_datasets(
        dataset_cfg, seed, use_speedperturb=use_sp, use_rand_shift=use_rs,
        shift_range=shift_range, use_wavedrop=use_wd,
    )
    batch_size = training_cfg.get("batch_size", 2)
    seg_len = int(dataset_cfg.get("segment", 3) * dataset_cfg.get("sample_rate", 16000)
                  * dataset_cfg.get("resample", 1.0))

    example = jnp.zeros((batch_size, seg_len), jnp.float32)
    model, qvars, teacher, teacher_params = create_model_and_teacher(
        model_cfg, training_cfg.get("pretrained"), example
    )

    optim_cfg = training_cfg.get("optim", {})
    cfg = TrainConfig(
        kd_lambda=training_cfg.get("kd_lambda", 0.1),
        lr=optim_cfg.get("lr", 1e-3),
        weight_decay=optim_cfg.get("weight_decay", 0.0),
        optimizer=optim_cfg.get("optimizer", "adam"),
        grad_clip=training_cfg.get("grad_clip", 5.0),
        threshold_byloss=env_name == "speechbrain" and training_cfg.get("threshold_byloss", False),
        threshold=training_cfg.get("threshold", -30.0),
        loss_upper_lim=training_cfg.get("loss_upper_lim", 999999.0),
    )
    tx = make_optimizer(cfg)
    state = create_train_state(qvars, tx, teacher_params=teacher_params)

    # Data-parallel mesh over the largest device count that divides the batch
    # (the reference's DDP requires batch % world_size == 0 the same way,
    # musdbhq_train.py:294).
    n_dev = len(jax.devices())
    while batch_size % n_dev != 0:
        n_dev -= 1
    mesh = make_mesh(n_dev)
    state = jax.device_put(state, replicated_sharding(mesh))
    train_step = make_train_step(model, teacher, tx, cfg)
    eval_step = make_eval_step(model)

    from fqss_tpu.utils.logging import RunLogger

    logger = RunLogger(work_dir, use_wandb=training_cfg.get("wandb", False), config=dict(conf))
    ckpt = CheckpointManager(work_dir)
    # Scheduler selection matches asteroid_librimix_trainer.py:95-101:
    # half_lr -> ReduceLROnPlateau(0.5, patience); elif step_lr -> StepLR
    # (the DPTNet config's scheduler, configs/dptnet_2spks_8k.yaml).
    if training_cfg.get("half_lr", True):
        plateau = ReduceLROnPlateau(
            factor=0.5,
            patience=training_cfg.get("patience", 5),
            # speechbrain's scheduler grace window (sepformer config: 20).
            dont_halve_until_epoch=training_cfg.get("dont_halve_until_epoch", 0),
        )
    elif training_cfg.get("step_lr") is not None:
        slr = training_cfg["step_lr"] or {}
        plateau = StepLR(step_size=slr.get("step_size", 2), gamma=slr.get("gamma", 0.98))
    else:
        plateau = None
    stopper = EarlyStopping(30) if training_cfg.get("early_stop", True) else None

    # Resume: observer=False in the quantization cfg means "resume from
    # checkpoint" (configs/convtasnet_2spks_8k.yaml:26); restore the latest
    # TrainState (params + quantizer state + optimizer + epoch) if present.
    start_epoch = 0
    if not model_cfg.get("quantization", {}).get("observer", True):
        template = jax.device_get(state)
        restored, last_epoch = ckpt.restore_latest(template)
        if last_epoch or ckpt.mgr.latest_step() is not None:
            state = jax.device_put(restored, replicated_sharding(mesh))
            start_epoch = last_epoch + 1
            save_log(work_dir, f"resumed from checkpoint at epoch {last_epoch}")

    # MSE-histogram calibration at the observer-window boundary: the reference
    # MSE quantizer self-calibrates inline when its 50th observation lands
    # (qat_quant.py:306-326 mse_minmax_range fires from forward). Here the
    # histogram accumulates on-device during the window and the host grid
    # search runs ONCE when the window closes (fqss_tpu.quant.calibration).
    from fqss_tpu.quant.calibration import DEFAULT_OBSERVER_WINDOW, has_pending_mse

    mse_pending = has_pending_mse(state.qstats)
    mse_window = model_cfg.get("quantization", {}).get(
        "max_observations", DEFAULT_OBSERVER_WINDOW
    )

    epochs = training_cfg.get("epochs", 50)
    best_val = float("inf")
    # speechbrain Checkpointer time-based interval (sepformer config
    # ckpt_interval_minutes: 60) — export the latest state mid-epoch so long
    # epochs survive preemption.
    ckpt_interval_s = 60.0 * float(training_cfg.get("ckpt_interval_minutes", 0) or 0)
    last_ckpt_t = time.time()
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses = []
        for mix, src in batch_iterator(train_set, batch_size, seed=seed, epoch=epoch):
            bmix, bsrc = shard_batch((mix, src), mesh)
            state, metrics = train_step(state, bmix, bsrc)
            losses.append(float(metrics["loss"]))
            if mse_pending and int(state.step) >= mse_window:
                state = _calibrate_mse_state(state, mesh)
                mse_pending = False
                save_log(work_dir, f"MSE quantizer calibration at step {int(state.step)}")
            if ckpt_interval_s and time.time() - last_ckpt_t >= ckpt_interval_s:
                _export_state(work_dir, "latest_model.npz", state)
                save_log(work_dir, f"interval checkpoint (epoch {epoch})")
                last_ckpt_t = time.time()

        val_losses = []
        for mix, src in batch_iterator(val_set, batch_size, shuffle=False, seed=seed, epoch=epoch):
            bmix, bsrc = shard_batch((mix, src), mesh)
            val_losses.append(float(eval_step(state, bmix, bsrc)["val_loss"]))
        val_loss = float(np.mean(val_losses)) if val_losses else float("nan")

        logger.log(
            {"loss": float(np.mean(losses)), "val_loss": val_loss,
             "lr_scale": float(state.lr_scale), "skipped": int(state.skipped),
             "epoch_time_s": time.time() - t0},
            step=epoch,
        )
        ckpt.save(epoch, jax.device_get(state), {"val_loss": val_loss, "loss": float(np.mean(losses))})
        _export_state(work_dir, "latest_model.npz", state)
        if val_loss < best_val:
            best_val = val_loss
            _export_state(work_dir, "best_model.npz", state)
        if plateau is not None:
            state = plateau.update(state, val_loss)
        if stopper is not None and stopper.update(val_loss):
            save_log(work_dir, f"Early stopping at epoch {epoch}")
            break

    ckpt.close()
    logger.finish()

    # speechbrain env: per-utterance test report after training
    # (speechbrain_librimix_trainer.py:336-441 save_results -> test_results.csv)
    testing_cfg = conf.get("testing_cfg", {})
    if env_name == "speechbrain" and testing_cfg.get("test_dir") and os.path.isdir(testing_cfg["test_dir"]):
        from fqss_tpu.train.validate import save_results

        variables = {"params": jax.device_get(state.params)}
        for coll in ("qparams", "qstats", "batch_stats"):
            if getattr(state, coll):
                variables[coll] = jax.device_get(getattr(state, coll))
        avg = save_results(
            model, variables, model_cfg, dataset_cfg, testing_cfg, work_dir,
            limit=testing_cfg.get("limit"),
        )
        save_log(work_dir, f"test_results.csv avg: {avg}")

    return {"best_val_loss": best_val, "epochs_run": epoch + 1, "state": jax.device_get(state)}


def _calibrate_mse_state(state, mesh):
    """Host grid-search the MSE-optimal ranges and write them into the state.

    Runs once, when the observer window closes (the functional analog of the
    reference's in-forward mse_minmax_range switch, qat_quant.py:306-326).
    """
    from fqss_tpu.quant.calibration import calibrate_mse_quantizers
    from fqss_tpu.quant.quantizers import QPARAMS, QSTATS

    variables = {
        QPARAMS: jax.device_get(state.qparams),
        QSTATS: jax.device_get(state.qstats),
    }
    variables = calibrate_mse_quantizers(variables)
    state = state.replace(qparams=variables[QPARAMS], qstats=variables[QSTATS])
    return jax.device_put(state, replicated_sharding(mesh))


def _export_state(work_dir: str, name: str, state) -> None:
    variables = {"params": jax.device_get(state.params)}
    if state.qparams:
        variables["qparams"] = jax.device_get(state.qparams)
    if state.qstats:
        variables["qstats"] = jax.device_get(state.qstats)
    if state.batch_stats:
        variables["batch_stats"] = jax.device_get(state.batch_stats)
    export_model(os.path.join(work_dir, name), variables)

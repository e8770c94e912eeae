"""Music (MUSDB) training recipes: tasnet and htdemucs environments.

Replaces the reference's two music trainers with the same SPMD step:
* tasnet (train_env/tasnet_musdbhq/musdbhq_train.py:45-167): per-GPU
  subprocess DDP becomes mesh data parallelism; weighted-L1 KD with
  w = 10**((nsdr - nsdr_q)/10); Shift/FlipSign/FlipChannels/Scale augments
  (on-device here); grad-norm logging; best/latest/checkpoint saves.
* htdemucs (train_env/htdemucs_musdbhq/solver.py): full solver behavior —
  exp((sdr-sdr_q)/10) KD weights, Remix + repitch augments, batch AND epoch
  EMA model zoos whose members are each validated with the main model every
  epoch and the best selected by ``test.metric`` (solver.py:52-58,220-236),
  best-state tracking/export (solver.py:256-260), periodic test-set
  evaluation every ``test.every`` epochs (solver.py:262-287), per-module
  optimizer groups for the cross-transformer (train.py:88-119
  make_optim_group), checkpoint packages carrying EMA states + best_state +
  history with resume/continue_from (solver.py:85-140).

Both read the reference YAML schema (work_dir/model_cfg/dataset_cfg/
training_cfg/testing_cfg).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Mapping

import numpy as np

import jax
import jax.numpy as jnp
import optax

from fqss_tpu.data.musdb import RepitchedWavset, Wavset, augment_batch, get_musdb_wav_datasets
from fqss_tpu.models.factory import create_model_and_teacher
from fqss_tpu.parallel import make_mesh, shard_batch
from fqss_tpu.parallel.mesh import replicated_sharding
from fqss_tpu.quant.quantizers import QPARAMS, QSTATS
from fqss_tpu.separation.losses import music_kd_l1_loss, nsdr_db
from fqss_tpu.separation.ola import ola_infer
from fqss_tpu.train.checkpoints import CheckpointManager, dump_config, export_model, save_log
from fqss_tpu.train.state import TrainState, create_train_state
from fqss_tpu.train.trainer import TrainConfig, _model_variables, make_optimizer
from fqss_tpu.utils.audio import set_seed

Array = jax.Array


def make_music_optimizer(
    cfg: TrainConfig, model_cfg: Mapping[str, Any], trainable_template: dict
) -> optax.GradientTransformation:
    """Optimizer with per-module groups (reference htdemucs train.py:88-119).

    The cross-transformer exposes its own optim group with ``t_lr`` /
    ``t_weight_decay`` (htdemucsq.py:525-529 make_optim_group); every other
    parameter uses the base lr/weight_decay. Gradient clipping (when enabled)
    stays global across groups like torch's clip_grad_norm_ over all params.
    """
    t_lr = model_cfg.get("t_lr")
    t_wd = float(model_cfg.get("t_weight_decay") or 0.0)

    def has_ct(tree) -> bool:
        return isinstance(tree, Mapping) and any(
            isinstance(sub, Mapping) and "crosstransformer" in sub for sub in tree.values()
        )

    if (t_lr is None and t_wd == 0.0) or not has_ct(trainable_template):
        return make_optimizer(cfg)

    def label_fn(tree):
        def lab(path, _leaf):
            keys = {getattr(p, "key", getattr(p, "name", None)) for p in path}
            return "t" if "crosstransformer" in keys else "base"

        return jax.tree_util.tree_map_with_path(lab, tree)

    def adam_for(lr: float, wd: float) -> optax.GradientTransformation:
        return optax.adamw(lr, weight_decay=wd) if wd else optax.adam(lr)

    chain = []
    if cfg.grad_clip and cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(
        optax.multi_transform(
            {"base": adam_for(cfg.lr, cfg.weight_decay), "t": adam_for(t_lr or cfg.lr, t_wd)},
            label_fn,
        )
    )
    return optax.chain(*chain)


def make_music_train_step(
    model,
    teacher,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    weight_kind: str = "pow10",
    augment_cfg: Mapping[str, Any] | None = None,
    is_htdemucs: bool = False,
    batch_ema_decays: tuple[float, ...] = (),
    source_weights=None,
):
    """KD train step over source batches [B, n_sources, C, T].

    Augmentation runs on-device inside the step; mix = sum of (augmented)
    sources (musdbhq_train.py:60-66). Batch-level EMA models are updated
    inside the step after the optimizer (solver.py:425-426); each EMA is a
    {"params", "qparams"} tree zipped with a static decay.
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
        loss = music_kd_l1_loss(wavs, fwavs, sources, cfg.kd_lambda, weight_kind,
                                source_weights=source_weights)
        return loss, mutated

    # Donate state + EMAs (see trainer.py train_step: avoids per-step
    # re-materialization of the full state through the TPU tunnel).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(state: TrainState, batch_emas: tuple, sources: Array, rng: Array):
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
        current = {"params": new_state.params, "qparams": new_state.qparams}
        new_emas = tuple(
            jax.tree_util.tree_map(lambda e, p, d=decay: d * e + (1.0 - d) * p, ema, current)
            for decay, ema in zip(batch_ema_decays, batch_emas)
        )
        grad_norm = optax.global_norm(grads)
        return new_state, new_emas, {"loss": loss, "grad_norm": grad_norm}

    return train_step


def _ema_update_host(tree: dict, current: dict, decay: float) -> dict:
    """Epoch-level EMA update (solver.py:438-440)."""
    return jax.tree_util.tree_map(lambda e, p: decay * e + (1.0 - decay) * p, tree, current)


def _validate_music(
    model,
    variables: dict,
    valid_set: Wavset,
    sources: tuple[str, ...],
    weights: np.ndarray,
    testing_cfg: Mapping[str, Any],
    is_htdemucs: bool = False,
    limit: int | None = None,
) -> dict:
    """Reference valid pass (solver.py:299-390, train=False): per full track,
    mix = stored mixture, estimate via OLA apply (valid_apply, overlap=0),
    weighted per-source L1 ``reco`` plus per-source NSDR."""
    kwargs = {"train": False} if is_htdemucs else {}
    apply_fn = jax.jit(lambda x: model.apply(variables, x, **kwargs))
    n = len(valid_set) if limit is None else min(limit, len(valid_set))
    recos, nsdrs = [], []
    for i in range(n):
        ex = np.asarray(valid_set[i])  # [1 + S, C, T]
        mix, srcs = ex[0], ex[1:]
        est = ola_infer(
            apply_fn, mix, n_srcs=len(sources),
            segment=testing_cfg.get("segment_samples"), overlap=0.0,
            # demucs TensorChunk semantics: valid chunks are center-padded
            # with real context to the model's train segment
            # (use_train_segment; musdbhq_utils.py:86-111)
            center_pad_to=testing_cfg.get("segment_samples") if is_htdemucs else None,
        )
        est = np.nan_to_num(est)[..., : srcs.shape[-1]]
        l1 = np.abs(est - srcs).mean(axis=tuple(range(1, srcs.ndim)))  # per source
        recos.append(float((l1 * weights).sum() / weights.sum()))
        per_src = np.asarray(
            nsdr_db(jnp.asarray(srcs.reshape(len(sources), -1)), jnp.asarray(est.reshape(len(sources), -1)))
        )
        nsdrs.append(per_src)
    nsdrs = np.stack(nsdrs).mean(axis=0) if nsdrs else np.zeros(len(sources))
    reco = float(np.mean(recos)) if recos else float("nan")
    out = {"loss": reco, "reco": reco, "nsdr": float((nsdrs * weights).sum() / weights.sum())}
    for name, v in zip(sources, nsdrs):
        out[f"nsdr_{name}"] = float(v)
    return out


def _is_better(candidate: float, incumbent: float, metric: str) -> bool:
    """solver.py:226-231 — nsdr metrics are maximized, losses minimized."""
    if metric.startswith("nsdr"):
        return candidate > incumbent
    return candidate < incumbent


def _hydra_compat(conf: Mapping[str, Any]) -> Mapping[str, Any]:
    """Map the reference hydra/dora htdemucs schema onto the plain schema.

    The reference configs/htdemucs.yaml keeps dataset/optimizer/augment/EMA
    settings in top-level hydra groups (``dset``, ``optim``, ``augment``,
    ``ema``, ``test``, ``epochs``, ``batch_size``, ``kd_lambda``,
    ``weights``, ``pretrained``, ``continue_from`` — reference
    train_env/htdemucs_musdbhq/train.py:122-231). When a ``dset`` group is
    present, synthesize this repo's dataset_cfg/training_cfg so the
    reference file runs unchanged; explicit plain-schema keys win.
    """
    if "dset" not in conf:
        return conf
    c = {k: v for k, v in conf.items()}
    dset = dict(conf.get("dset") or {})
    aug = dict(conf.get("augment") or {})
    optim = dict(conf.get("optim") or {})

    ds = dict(c.get("dataset_cfg") or {})
    ds.setdefault("name", "musdbhq")
    if dset.get("musdb"):
        ds.setdefault("musdb_root", dset["musdb"])
    sr = dset.get("samplerate", 44100)
    ds.setdefault("sample_rate", sr)
    ds.setdefault("segment", dset.get("segment", 10))
    ds.setdefault("data_stride", dset.get("shift", 1))
    meta = dset.get("metadata")
    if meta:
        ds.setdefault("metadata_file", os.path.join(meta, "musdbhq.json") if os.path.isdir(meta) else meta)
    remix = dict(aug.get("remix") or {})
    scale = dict(aug.get("scale") or {})
    repitch = dict(aug.get("repitch") or {})
    ds.setdefault("augmentation", {
        "enable": True,
        # demucs Shift(shift=samplerate * dset.shift) (train.py:191-199)
        "shift": int(sr * dset.get("shift", 1)),
        "flip": bool(aug.get("flip", True)),
        "scale": bool(scale.get("proba", 1)),
        "remix_group_size": int(remix.get("group_size", 4)) if remix.get("proba", 1) else 0,
        "repitch": {
            "proba": repitch.get("proba", 0.2),
            "max_tempo": repitch.get("max_tempo", 12),
        },
    })
    c["dataset_cfg"] = ds

    mc = dict(c.get("model_cfg") or {})
    if dset.get("sources"):
        mc.setdefault("sources", list(dset["sources"]))
    if dset.get("channels"):
        mc.setdefault("audio_channels", int(dset["channels"]))
    c["model_cfg"] = mc

    tc = dict(c.get("training_cfg") or {})
    for key in ("epochs", "batch_size", "kd_lambda", "seed", "weights",
                "pretrained", "continue_from", "continue_best", "ema"):
        if key in conf and conf[key] is not None:
            tc.setdefault(key, conf[key])
    if optim:
        tc.setdefault("optim", {
            "lr": optim.get("lr", 3e-4),
            "weight_decay": optim.get("weight_decay", 0.0),
            "optimizer": optim.get("optim", "adam"),
            "clip_grad": optim.get("clip_grad", 0.0),
        })
    if "test" in conf and conf["test"]:
        tc.setdefault("test", dict(conf["test"]))
    c["training_cfg"] = tc
    return c


def _train_music(conf: Mapping[str, Any], env: str) -> dict:
    conf = _hydra_compat(conf)
    work_dir = conf["work_dir"]
    model_cfg = conf["model_cfg"]
    dataset_cfg = conf.get("dataset_cfg", {})
    training_cfg = conf.get("training_cfg", {})
    testing_cfg = conf.get("testing_cfg", {})

    seed = training_cfg.get("seed", 0)
    set_seed(seed)
    dump_config(work_dir, dict(conf))

    sources = tuple(model_cfg.get("sources", ["drums", "bass", "other", "vocals"]))
    sample_rate = dataset_cfg.get("sample_rate", 44100)
    # Accept both this repo's keys and the reference YAML spellings
    # (reference configs/convtasnet_music.yaml: train_dir / metadata /
    # segment_samples / data_stride-in-samples), so a reference config runs
    # unchanged.
    if "segment_samples" in dataset_cfg:
        samples = int(dataset_cfg["segment_samples"])
    else:
        samples = int(dataset_cfg.get("segment", 6) * sample_rate)
    stride_cfg = dataset_cfg.get("data_stride", 1)
    # reference data_stride is in samples (44100); ours in seconds (1).
    stride = int(stride_cfg) if stride_cfg >= 1000 else int(stride_cfg * sample_rate)
    root = dataset_cfg.get("musdb_root") or dataset_cfg["train_dir"]
    train_set, valid_set = get_musdb_wav_datasets(
        root, stride, sample_rate, samples, sources,
        metadata_file=dataset_cfg.get("metadata_file") or dataset_cfg.get("metadata"),
    )

    is_htd = env == "htdemucs"
    aug_cfg = dict(dataset_cfg.get("augmentation", {"enable": True, "shift": min(8192, samples // 8)}))
    repitch_cfg = dict(aug_cfg.pop("repitch", {}) or {})
    if is_htd and repitch_cfg.get("proba", 0) > 0:
        # RepitchedWrapper (train.py:207-214): wraps the train set only; all
        # examples shrink to the worst-case stretched length.
        train_set = RepitchedWavset(
            train_set,
            proba=repitch_cfg.get("proba", 0.2),
            max_pitch=repitch_cfg.get("max_pitch", 2),
            max_tempo=repitch_cfg.get("max_tempo", 12.0),
            tempo_std=repitch_cfg.get("tempo_std", 5.0),
            seed=seed,
        )
        samples = train_set.out_length

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
        # reference htdemucs default optim.clip_grad: 0 (no clipping)
        grad_clip=training_cfg.get("grad_clip", optim_cfg.get("clip_grad", 0.0) if is_htd else 5.0),
    )
    trainable_template = {"params": qvars.get("params", {}), "qparams": qvars.get("qparams", {})}
    tx = make_music_optimizer(cfg, model_cfg, trainable_template) if is_htd else make_optimizer(cfg)
    state = create_train_state(qvars, tx, teacher_params=teacher_params)

    # EMA model zoo (solver.py:49-58). Config: training_cfg.ema.{batch,epoch}
    # decay lists; legacy key ema_batch maps to ema.batch.
    ema_cfg = dict(training_cfg.get("ema", {}) or {})
    batch_decays = tuple(ema_cfg.get("batch", training_cfg.get("ema_batch", [0.9995] if is_htd else [])))
    epoch_decays = tuple(ema_cfg.get("epoch", ()) if is_htd else ())
    current0 = {"params": state.params, "qparams": state.qparams}
    batch_emas = tuple(jax.tree_util.tree_map(jnp.array, current0) for _ in batch_decays)
    epoch_emas = [jax.tree_util.tree_map(jnp.array, current0) for _ in epoch_decays]
    best_state = jax.tree_util.tree_map(np.asarray, current0)

    n_dev = len(jax.devices())
    while batch_size % n_dev != 0:
        n_dev -= 1
    mesh = make_mesh(n_dev)
    state = jax.device_put(state, replicated_sharding(mesh))

    weights = np.asarray(training_cfg.get("weights", [1.0] * len(sources)), np.float32)
    step_fn = make_music_train_step(
        model, teacher, tx, cfg,
        weight_kind="exp" if is_htd else "pow10",
        augment_cfg=aug_cfg,
        is_htdemucs=is_htd,
        batch_ema_decays=batch_decays,
        # htdemucs applies the per-source config weights to the TRAIN loss
        # too (solver.py:371-372); the tasnet trainer has no source weights.
        source_weights=weights if is_htd else None,
    )
    test_cfg = dict(training_cfg.get("test", {}) or {})
    test_every = int(test_cfg.get("every", testing_cfg.get("every", 0) or 0))
    test_metric = str(test_cfg.get("metric", "loss"))
    test_best = bool(test_cfg.get("best", True))
    valid_limit = training_cfg.get("valid_limit")

    ckpt = CheckpointManager(work_dir)

    def ckpt_tree(state_host):
        return {
            "state": state_host,
            "batch_emas": jax.tree_util.tree_map(np.asarray, batch_emas),
            "epoch_emas": jax.tree_util.tree_map(np.asarray, epoch_emas),
            "best_state": best_state,
        }

    # Resume (solver.py:111-122): a checkpoint in work_dir restores state,
    # EMAs, best_state, and the metric history is replayed. continue_from
    # (solver.py:128-140) seeds the model from another experiment's package.
    start_epoch = 0
    template = ckpt_tree(jax.device_get(state))
    if ckpt.mgr.latest_step() is not None:
        restored, last_epoch = ckpt.restore_latest(template)
        state = jax.device_put(restored["state"], replicated_sharding(mesh))
        batch_emas = tuple(jax.device_put(t, replicated_sharding(mesh)) for t in restored["batch_emas"])
        epoch_emas = list(restored["epoch_emas"])
        best_state = restored["best_state"]
        start_epoch = last_epoch + 1
        for h in ckpt.history:
            save_log(work_dir, f"replay epoch {h.get('epoch')}: " + " ".join(
                f"{k}={v:.4f}" for k, v in h.items() if k != "epoch" and isinstance(v, float)))
        save_log(work_dir, f"resumed from checkpoint at epoch {last_epoch}")
    elif training_cfg.get("continue_from"):
        other = CheckpointManager(training_cfg["continue_from"])
        if other.mgr.latest_step() is not None:
            restored, _ = (other.restore_best(template) if training_cfg.get("continue_best", True)
                           else other.restore_latest(template))
            src_tree = restored["best_state"] if training_cfg.get("continue_best", True) else {
                "params": restored["state"].params, "qparams": restored["state"].qparams}
            state = state.replace(params=src_tree["params"], qparams=src_tree["qparams"])
            state = jax.device_put(jax.device_get(state), replicated_sharding(mesh))
            save_log(work_dir, f"continued from {training_cfg['continue_from']}")
        other.close()

    # MSE-histogram calibration at the observer-window close (same protocol
    # as the speech recipe; reference analog qat_quant.py:306-326).
    from fqss_tpu.quant.calibration import DEFAULT_OBSERVER_WINDOW, has_pending_mse
    from fqss_tpu.train.recipes import _calibrate_mse_state

    mse_pending = has_pending_mse(state.qstats)
    mse_window = (model_cfg.get("quantization") or {}).get(
        "max_observations", DEFAULT_OBSERVER_WINDOW
    )

    rng = jax.random.PRNGKey(seed)
    epochs = training_cfg.get("epochs", 4)
    metric_history: list[float] = [
        h[f"valid_{test_metric}"] for h in ckpt.history if f"valid_{test_metric}" in h
    ]
    best_loss = float("inf")
    order = np.arange(len(train_set))
    result_test: dict | None = None
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        np.random.default_rng(seed + epoch).shuffle(order)
        losses = []
        metrics = {"grad_norm": 0.0}
        for i in range(0, (len(order) // batch_size) * batch_size, batch_size):
            batch = np.stack([train_set[int(j)] for j in order[i : i + batch_size]])  # [B, S, C, T]
            rng, sub = jax.random.split(rng)
            bsrc = shard_batch(jnp.asarray(batch), mesh)
            state, batch_emas, metrics = step_fn(state, batch_emas, bsrc, sub)
            losses.append(float(metrics["loss"]))
            if mse_pending and int(state.step) >= mse_window:
                state = _calibrate_mse_state(state, mesh)
                mse_pending = False
                save_log(work_dir, f"MSE quantizer calibration at step {int(state.step)}")
        mean_loss = float(np.mean(losses)) if losses else float("nan")

        # epoch EMAs update once per epoch (solver.py:438-440)
        current = {"params": state.params, "qparams": state.qparams}
        epoch_emas = [_ema_update_host(t, current, d) for t, d in zip(epoch_emas, epoch_decays)]

        # Cross-validate main + every EMA; keep the best by test.metric
        # (solver.py:208-236).
        candidates: list[tuple[str, dict]] = [("main", jax.device_get(current))]
        candidates += [(f"ema_batch_{k}", jax.device_get(t)) for k, t in enumerate(batch_emas)]
        candidates += [(f"ema_epoch_{k}", jax.device_get(t)) for k, t in enumerate(epoch_emas)]
        qvars_extra = {k: v for k, v in (("qstats", jax.device_get(state.qstats)),
                                         ("batch_stats", jax.device_get(state.batch_stats))) if v}
        bname, bvalid, bstate_tree = None, None, None
        valid_main = None
        for name, tree in candidates:
            variables = {"params": tree["params"], **qvars_extra}
            if tree["qparams"]:
                variables["qparams"] = tree["qparams"]
            v = _validate_music(model, variables, valid_set, sources, weights, testing_cfg,
                                is_htdemucs=is_htd, limit=valid_limit)
            if name == "main":
                valid_main = v
            if bvalid is None or _is_better(v[test_metric], bvalid[test_metric], test_metric):
                bname, bvalid, bstate_tree = name, v, tree
        valid_loss = bvalid[test_metric]
        metric_history.append(valid_loss)
        hist_best = (max if test_metric.startswith("nsdr") else min)(metric_history)
        if valid_loss == hist_best:
            best_state = jax.tree_util.tree_map(np.asarray, bstate_tree)

        save_log(
            work_dir,
            f"epoch {epoch}: loss={mean_loss:.5f} valid_loss={valid_main['loss']:.5f} "
            f"valid_nsdr={valid_main['nsdr']:.3f} best={hist_best:.5f} bname={bname} "
            f"grad_norm={float(metrics['grad_norm']):.3f} time={time.time() - t0:.1f}s",
        )

        epoch_metrics = {
            "val_loss": float(valid_main["loss"]), "loss": mean_loss,
            f"valid_{test_metric}": float(valid_loss), "valid_nsdr": float(bvalid["nsdr"]),
        }
        ckpt.save(epoch, ckpt_tree(jax.device_get(state)), epoch_metrics)

        variables = {"params": jax.device_get(state.params), **qvars_extra}
        if state.qparams:
            variables["qparams"] = jax.device_get(state.qparams)
        export_model(f"{work_dir}/latest_model.npz", variables)
        if valid_loss == hist_best:
            best_vars = {"params": best_state["params"], **qvars_extra}
            if best_state["qparams"]:
                best_vars["qparams"] = best_state["qparams"]
            export_model(f"{work_dir}/best_model.npz", best_vars)
        best_loss = min(best_loss, mean_loss)

        # Periodic test-set evaluation (solver.py:262-287) with the best
        # known state (test.best).
        is_last = epoch == epochs - 1
        if testing_cfg.get("test_dir") and ((test_every and (epoch + 1) % test_every == 0) or is_last):
            from fqss_tpu.train.validate_musdb import val_musdbhq_nsdr

            eval_tree = best_state if test_best else jax.device_get(current)
            eval_vars = {"params": eval_tree["params"], **qvars_extra}
            if eval_tree["qparams"]:
                eval_vars["qparams"] = eval_tree["qparams"]
            vals = val_musdbhq_nsdr(model, eval_vars, model_cfg, testing_cfg, limit=testing_cfg.get("limit"))
            result_test = {"nsdr": vals[0], **{f"nsdr_{s}": v for s, v in zip(sources, vals[1:])}}
            save_log(work_dir, f"test epoch {epoch}: " + " ".join(f"{k}={v:.3f}" for k, v in result_test.items()))

    ckpt.close()
    return {
        "best_loss": best_loss,
        "epochs_run": epochs,
        "state": jax.device_get(state),
        "best_state": best_state,
        "batch_emas": jax.tree_util.tree_map(np.asarray, batch_emas),
        "epoch_emas": jax.tree_util.tree_map(np.asarray, epoch_emas),
        "bname": bname if epochs > start_epoch else None,
        "test": result_test,
    }


def train_tasnet_music(conf: Mapping[str, Any]) -> dict:
    """tasnet env entry (tasnet_musdbhq_trainer.py:8 + musdbhq_train.py:170)."""
    return _train_music(conf, "tasnet")


def train_htdemucs(conf: Mapping[str, Any]) -> dict:
    """htdemucs env entry (htdemucs_musdbhq/train.py:234-268)."""
    return _train_music(conf, "htdemucs")

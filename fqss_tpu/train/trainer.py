"""Unified QAT trainer: one jitted SPMD train step, four recipe behaviors.

Replaces the reference's four training environments (pytorch-lightning,
speechbrain, hand-rolled DDP, dora — SURVEY.md §2.6) with a single
data-parallel train step compiled by XLA over a device mesh:

* student forward with mutable quantizer collections (observer EMA runs
  inside the step; the phase switch is traced, so one compilation covers the
  whole run),
* float-teacher forward under stop_gradient,
* sensitivity-weighted KD loss (mysystem.py:124-146),
* grads for model params AND learned quantizer ranges in one optax update
  (clip-by-global-norm like the reference's grad_clip 5.0,
  asteroid_librimix_trainer.py:128),
* optional speechbrain-style robustness: per-sample loss thresholding and
  non-finite/over-limit update skipping (speechbrain_librimix_trainer.py:140-197),
* ReduceLROnPlateau/StepLR via a state-carried multiplicative LR scale.

Data parallelism: shard the batch over the mesh's ``dp`` axis and keep the
state replicated — XLA emits the gradient all-reduce over ICI. Observer
statistics therefore see the *global* batch min/max (an improvement over the
reference, whose DDP ranks silently desync their observer parameters since
DDP only all-reduces gradients).
"""

from __future__ import annotations

import functools
import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from fqss_tpu.quant.quantizers import QPARAMS, QSTATS
from fqss_tpu.separation.losses import fqss_kd_loss, pit_neg_sisdr_db
from fqss_tpu.train.state import TrainState, create_train_state

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    kd_lambda: float = 0.1
    lr: float = 1e-3
    weight_decay: float = 0.0
    grad_clip: float = 5.0
    # speechbrain-style robustness (speechbrain_librimix_trainer.py:140-197)
    threshold_byloss: bool = False
    threshold: float = -30.0
    loss_upper_lim: float = 999999.0
    optimizer: str = "adam"
    # bf16 teacher forward: the float teacher needs no quant-grid fidelity.
    # NOTE: measured 60x SLOWER on the axon-tunneled v5e (bf16 conv1d falls
    # off the fast path there); keep float32 unless profiling shows otherwise
    # on the target runtime.
    teacher_dtype: str = "float32"


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam/AdamW with global-norm clipping and a state-scaled LR.

    The LR is multiplied by ``lr_scale`` carried in TrainState — the
    functional ReduceLROnPlateau/half-lr mechanism
    (asteroid_librimix_trainer.py:110-115 half_lr with factor 0.5/patience 5).
    """
    chain = []
    if cfg.grad_clip and cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.optimizer == "adam":
        if cfg.weight_decay:
            chain.append(optax.adamw(cfg.lr, weight_decay=cfg.weight_decay))
        else:
            chain.append(optax.adam(cfg.lr))
    elif cfg.optimizer == "sgd":
        chain.append(optax.sgd(cfg.lr))
    else:
        raise ValueError(cfg.optimizer)
    return optax.chain(*chain)


def _model_variables(state: TrainState, trainable: dict) -> dict:
    variables = {"params": trainable["params"]}
    if state.qparams or trainable.get("qparams"):
        variables[QPARAMS] = trainable["qparams"]
    if state.qstats:
        variables[QSTATS] = state.qstats
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return variables


def make_train_step(
    model,
    teacher,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    loss_fn: Callable | None = None,
    donate: bool = True,
) -> Callable[[TrainState, Array, Array], tuple[TrainState, dict]]:
    """Build the jitted KD train step.

    model/teacher: flax modules mapping [B, T] mixtures -> [B, S, T'].
    loss_fn(est, fest, targets) -> (loss, kd_loss); defaults to the FQSS
    speech KD loss. Returned step: (state, mix, targets) -> (state, metrics).
    ``donate=False`` keeps the input state alive (for callers that step the
    same state more than once, e.g. equivalence tests).
    """
    if loss_fn is None:
        loss_fn = partial(fqss_kd_loss, kd_lambda=cfg.kd_lambda)

    def compute_loss(trainable, state, mix, targets):
        variables = _model_variables(state, trainable)
        mutable = [c for c in (QPARAMS, QSTATS, "batch_stats") if c in variables and variables[c]]
        if mutable:
            est, mutated = model.apply(variables, mix, mutable=mutable)
        else:
            est, mutated = model.apply(variables, mix), {}
        t_len = targets.shape[-1]
        est = est[..., :t_len]
        if cfg.kd_lambda > 0 and state.teacher_params is not None:
            if cfg.teacher_dtype == "bfloat16":
                tp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), state.teacher_params)
                fest = teacher.apply({"params": tp}, mix.astype(jnp.bfloat16))[..., :t_len].astype(jnp.float32)
            else:
                fest = teacher.apply({"params": state.teacher_params}, mix)[..., :t_len]
        else:
            fest = jax.lax.stop_gradient(est)
        if cfg.threshold_byloss:
            # speechbrain per-sample loss thresholding: keep only the hard
            # samples (loss > threshold) before the mean — applied to the
            # KD-weighted per-sample losses exactly as the reference does
            # during QAT/KD training (speechbrain_librimix_trainer.py:138-149:
            # compute_kd_objectives returns per-utterance losses, then
            # ``loss[loss > th].mean()``). When no sample clears the
            # threshold the reference keeps the unfiltered mean.
            per, kd_per = fqss_kd_loss(
                est, fest, targets, kd_lambda=cfg.kd_lambda, per_sample=True
            )
            keep = (per > cfg.threshold).astype(per.dtype)
            n_keep = jnp.sum(keep)
            loss = jnp.where(
                n_keep > 0,
                jnp.sum(per * keep) / jnp.maximum(n_keep, 1.0),
                jnp.mean(per),
            )
            return loss, (jnp.mean(kd_per), mutated)
        loss, kd_loss = loss_fn(est, fest, targets)
        return loss, (kd_loss, mutated)

    # Donate the state: the step consumes it, so its buffers are reused for
    # the new state in place. Besides the usual memory saving, through this
    # environment's TPU tunnel non-donated multi-hundred-MB state outputs
    # are re-materialized per step at ~1000x the compute cost (measured:
    # 38 s/step full-size without donation). No-op on the CPU test backend.
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, mix: Array, targets: Array):
        grad_fn = jax.value_and_grad(compute_loss, has_aux=True)
        (loss, (kd_loss, mutated)), grads = grad_fn(state.trainable, state, mix, targets)

        # Observer mutations are the base the optimizer update applies to.
        base = {
            "params": state.params,
            "qparams": mutated.get(QPARAMS, state.qparams),
        }
        updates, new_opt_state = tx.update(grads, state.opt_state, base)
        # lr_scale multiplies the final update — exact LR scaling for any
        # optimizer (the ReduceLROnPlateau / half_lr mechanism).
        updates = jax.tree_util.tree_map(lambda u: u * state.lr_scale, updates)
        new_trainable = optax.apply_updates(base, updates)

        # Non-finite / over-limit robustness: skip the whole update.
        ok = jnp.logical_and(jnp.isfinite(loss), loss < cfg.loss_upper_lim)
        ok_f = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, old
        )
        new_state = state.replace(
            step=state.step + 1,
            params=ok_f(new_trainable["params"], state.params),
            qparams=ok_f(new_trainable["qparams"], base["qparams"]),
            qstats=mutated.get(QSTATS, state.qstats),
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            opt_state=ok_f(new_opt_state, state.opt_state),
            skipped=state.skipped + (1 - ok.astype(jnp.int32)),
        )
        grad_norm = optax.global_norm(grads)
        return new_state, {"loss": loss, "kd_loss": kd_loss, "grad_norm": grad_norm, "skipped": ~ok}

    return train_step


def make_eval_step(model) -> Callable[[TrainState, Array, Array], dict]:
    """Validation step: PIT neg SI-SDR without KD (mysystem.py:148-151)."""

    @jax.jit
    def eval_step(state: TrainState, mix: Array, targets: Array):
        variables = _model_variables(state, state.trainable)
        est = model.apply(variables, mix)[..., : targets.shape[-1]]
        return {"val_loss": pit_neg_sisdr_db(est, targets)}

    return eval_step


class ReduceLROnPlateau:
    """Host-side plateau scheduler writing TrainState.lr_scale.

    Functional equivalent of torch ReduceLROnPlateau as used by the asteroid
    recipe (asteroid_librimix_trainer.py:110-115: factor 0.5, patience 5).

    ``dont_halve_until_epoch`` is the speechbrain scheduler's grace window
    (configs/sepformer_2spks_8k.yaml: factor 0.5, patience 3, grace 20):
    no reduction fires before that many update() calls have elapsed.
    """

    def __init__(
        self,
        factor: float = 0.5,
        patience: int = 5,
        min_scale: float = 1e-4,
        dont_halve_until_epoch: int = 0,
    ):
        self.factor = factor
        self.patience = patience
        self.min_scale = min_scale
        self.dont_halve_until_epoch = dont_halve_until_epoch
        self.best = float("inf")
        self.bad_epochs = 0
        self.epochs = 0

    def update(self, state: TrainState, val_loss: float) -> TrainState:
        self.epochs += 1
        if val_loss < self.best:
            self.best = val_loss
            self.bad_epochs = 0
            return state
        if self.epochs <= self.dont_halve_until_epoch:
            return state
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            new_scale = max(float(state.lr_scale) * self.factor, self.min_scale)
            return state.replace(lr_scale=jnp.asarray(new_scale, jnp.float32))
        return state


class StepLR:
    """Host-side step scheduler writing TrainState.lr_scale.

    Functional equivalent of torch StepLR as the asteroid recipe uses it for
    DPTNet (asteroid_librimix_trainer.py:99-101, step_size=2, gamma=0.98;
    configs/dptnet_2spks_8k.yaml): after epoch e the LR is
    lr0 * gamma^floor((e+1)/step_size). Call update() once per epoch end.
    """

    def __init__(self, step_size: int = 2, gamma: float = 0.98):
        self.step_size = max(1, int(step_size))
        self.gamma = gamma
        self.epochs = 0

    def update(self, state: TrainState, val_loss: float | None = None) -> TrainState:
        self.epochs += 1
        scale = self.gamma ** (self.epochs // self.step_size)
        return state.replace(lr_scale=jnp.asarray(scale, jnp.float32))


class EarlyStopping:
    """EarlyStopping(patience) like the asteroid recipe's 30-epoch stopper
    (asteroid_librimix_trainer.py:119-123)."""

    def __init__(self, patience: int = 30):
        self.patience = patience
        self.best = float("inf")
        self.bad_epochs = 0

    def update(self, val_loss: float) -> bool:
        """Returns True when training should stop."""
        if val_loss < self.best:
            self.best = val_loss
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.bad_epochs >= self.patience


__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "ReduceLROnPlateau",
    "EarlyStopping",
]

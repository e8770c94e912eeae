"""Unified trainer: SPMD train step, optimizers, schedulers, checkpointing."""

from fqss_tpu.train.state import TrainState, create_train_state
from fqss_tpu.train.trainer import (
    EarlyStopping,
    ReduceLROnPlateau,
    StepLR,
    TrainConfig,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "TrainConfig",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "ReduceLROnPlateau",
    "StepLR",
    "EarlyStopping",
]

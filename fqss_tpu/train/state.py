"""Train state: one functional struct for params, quantizer state, optimizer.

Replaces the reference's four per-env checkpoint schemes' in-memory state
(SURVEY.md §5 checkpoint/resume) with a single pytree that jit/pjit can
thread, donate, and orbax can serialize atomically.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any
    qparams: Any  # learned quantizer ranges/mu ({} when float)
    qstats: Any  # observer counters/histograms ({} when float)
    batch_stats: Any  # flax BatchNorm running stats ({} if unused)
    opt_state: Any
    teacher_params: Any  # frozen float-teacher weights (None if kd off)
    lr_scale: Array  # multiplicative LR scale (ReduceLROnPlateau state)
    skipped: Array  # count of skipped non-finite/over-threshold steps

    @property
    def trainable(self):
        return {"params": self.params, "qparams": self.qparams}


def create_train_state(
    variables: dict,
    tx: optax.GradientTransformation,
    teacher_params=None,
) -> TrainState:
    params = variables.get("params", {})
    qparams = variables.get("qparams", {})
    trainable = {"params": params, "qparams": qparams}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        qparams=qparams,
        qstats=variables.get("qstats", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(trainable),
        teacher_params=teacher_params,
        lr_scale=jnp.ones((), jnp.float32),
        skipped=jnp.zeros((), jnp.int32),
    )

"""Experiment logging: results.txt + optional wandb (no-op when absent).

The reference logs to results.txt (utils.py:16-21) and optionally to wandb
in three trainers (asteroid_librimix_trainer.py:176-183,
musdbhq_train.py:236-241). wandb is not in this image, so the logger
degrades to file/stdout logging with the same call surface.
"""

from __future__ import annotations

from typing import Any, Mapping

from fqss_tpu.train.checkpoints import save_log


class RunLogger:
    def __init__(self, work_dir: str, use_wandb: bool = False, project: str = "fqss-tpu", config: Mapping | None = None):
        self.work_dir = work_dir
        self.wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: PLC0415

                self.wandb = wandb
                wandb.init(project=project, config=dict(config or {}), dir=work_dir)
            except ImportError:
                print("wandb requested but not installed; falling back to file logging")

    def log(self, metrics: Mapping[str, Any], step: int | None = None) -> None:
        if self.wandb is not None:
            self.wandb.log(dict(metrics), step=step)
        text = " ".join(f"{k}={float(v):.5g}" for k, v in metrics.items())
        save_log(self.work_dir, (f"step {step}: " if step is not None else "") + text)

    def finish(self) -> None:
        if self.wandb is not None:
            self.wandb.finish()

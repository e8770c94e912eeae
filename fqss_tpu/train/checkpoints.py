"""Checkpointing: atomic, resumable, best/latest exports (orbax-backed).

Unifies the reference's four per-env schemes (SURVEY.md §5):
* asteroid: top-k on val_loss + best_model/latest_model exports
  (asteroid_librimix_trainer.py:117-123,199-214)
* tasnet: SavedState{metrics, last_state, best_state, optimizer} with
  atomic tmp-rename (musdbhq_train.py:27-33,333-360)
* speechbrain: Checkpointer recoverables, keep-best
* htdemucs: checkpoint.th incl. history + EMA states, write_and_rename

One scheme here: an orbax CheckpointManager holding the full TrainState
(params + quantizer state + optimizer + step) with best/latest retention and
metric history, plus a conf.yml dump of the run config into work_dir
(asteroid_librimix_trainer.py:166-171).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import yaml

import jax
import orbax.checkpoint as ocp

from fqss_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, work_dir: str, keep: int = 3):
        self.work_dir = os.path.abspath(work_dir)
        os.makedirs(self.work_dir, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            os.path.join(self.work_dir, "checkpoints"),
            options=ocp.CheckpointManagerOptions(
                # A save without a val_loss (e.g. a train-only epoch) must
                # never win best-tracking under mode=min.
                max_to_keep=keep,
                best_fn=lambda m: m.get("val_loss", float("inf")),
                best_mode="min",
            ),
        )
        self.history_path = os.path.join(self.work_dir, "history.json")
        self.history: list[dict] = []
        if os.path.exists(self.history_path):
            self.history = json.load(open(self.history_path))

    def save(self, epoch: int, state: TrainState, metrics: dict[str, float]) -> None:
        metrics = {k: float(v) for k, v in metrics.items()}
        self.mgr.save(epoch, args=ocp.args.StandardSave(jax.tree_util.tree_map(np.asarray, state)), metrics=metrics)
        self.mgr.wait_until_finished()
        self.history.append({"epoch": epoch, **metrics})
        tmp = self.history_path + ".tmp"
        json.dump(self.history, open(tmp, "w"), indent=1)
        os.replace(tmp, self.history_path)  # atomic, like write_and_rename (solver.py:85-109)

    def restore_latest(self, template: TrainState) -> tuple[TrainState, int]:
        step = self.mgr.latest_step()
        if step is None:
            return template, 0
        restored = self.mgr.restore(step, args=ocp.args.StandardRestore(template))
        return restored, step

    def restore_best(self, template: TrainState) -> tuple[TrainState, int]:
        step = self.mgr.best_step()
        if step is None:
            return self.restore_latest(template)
        return self.mgr.restore(step, args=ocp.args.StandardRestore(template)), step

    def close(self):
        self.mgr.close()


def export_model(path: str, variables: dict) -> None:
    """Flat .npz export of model variables (the 'best_model.pth' analog)."""
    flat = {}
    for col, tree in variables.items():
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, leaf in leaves:
            flat[col + "/" + "/".join(getattr(k, "key", str(k)) for k in kp)] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def restore_variables(path: str, template: dict) -> dict:
    """Load a .npz export back into a congruent variables tree."""
    if os.path.isdir(path):  # orbax checkpoint dir
        ckpt = ocp.StandardCheckpointer()
        return dict(ckpt.restore(path, template))
    data = np.load(path)
    out: dict[str, Any] = {}
    template = {k: v for k, v in template.items() if k != "macs"}  # diagnostics, never persisted
    for col, tree in template.items():
        paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for kp, leaf in paths:
            key = col + "/" + "/".join(getattr(k, "key", str(k)) for k in kp)
            if key not in data:
                raise ValueError(f"Missing key in checkpoint: {key}")
            leaves.append(data[key].astype(np.asarray(leaf).dtype))
        out[col] = jax.tree_util.tree_unflatten(treedef, leaves)
    return out


def dump_config(work_dir: str, config: dict) -> None:
    """conf.yml dump like asteroid_librimix_trainer.py:166-171."""
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "conf.yml"), "w") as f:
        yaml.safe_dump(config, f, default_flow_style=False)


def save_log(work_dir: str, text: str) -> None:
    """Append to results.txt (utils.py:16-21)."""
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "results.txt"), "a") as f:
        f.write(text + "\n")
    print(text)

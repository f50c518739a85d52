"""Checkpointing: rolling keep-3 by step + separate best-by-score.

Mirrors the reference's policy (`zebrapose/utils_v2.py:4-51`): numeric-step
checkpoints with only the newest 3 kept, plus a single best checkpoint
whose score is recorded (the reference encodes it in the filename, e.g.
`0_9097step376000`; we store it in the payload and a `best_score.txt`
sidecar for human inspection). Backed by orbax (async-capable, TPU-aware
sharded save/restore) instead of torch.save.

Contents saved: params, batch_stats, opt_state, step, histogram EMA,
best_score — everything needed for exact resume (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from zebrapose_tpu.train.state import TrainState


def _state_payload(state: TrainState) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "histogram": state.histogram,
        "best_score": state.best_score,
    }


def is_step_dir(path: str) -> bool:
    """True if `path` is a direct orbax step payload (.../steps/N or
    .../best/step_N), as opposed to a CheckpointManager root."""
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, "_CHECKPOINT_METADATA"))


def restore_step_dir(path: str, state: TrainState) -> TrainState:
    """Restore a direct orbax step payload dir into a state template.

    Lets eval entrypoints accept `.../checkpoints/best/step_2500`
    verbatim — pointing a CheckpointManager at such a dir would find no
    rolling steps and silently hand back the caller's (random-init)
    template, which as a production eval failure mode is poses-shaped
    garbage with no error anywhere."""
    target = jax.tree.map(np.asarray, _state_payload(state))
    payload = ocp.StandardCheckpointer().restore(path, target=target)
    return state.replace(**payload)


class CheckpointManager:
    """Rolling step checkpoints (keep 3) + best-score checkpoint."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "steps"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True))
        self._best_dir = os.path.join(self.directory, "best")
        self._ckptr = ocp.StandardCheckpointer()

    # -- rolling ----------------------------------------------------------
    def save(self, state: TrainState) -> None:
        """Async rolling save: the device->host copy happens here, the
        disk write overlaps subsequent train steps (the reference's
        torch.save blocks the loop for the whole write). Readers
        (latest_step/restore/close) synchronize first, and orbax
        serializes overlapping saves internally."""
        self._mgr.save(int(jax.device_get(state.step)),
                       args=ocp.args.StandardSave(_state_payload(state)))

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the (freshly initialized) `state` template."""
        self._mgr.wait_until_finished()
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return state
        target = jax.tree.map(np.asarray, _state_payload(state))
        payload = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target))
        return state.replace(**payload)

    # -- best -------------------------------------------------------------
    def save_best(self, state: TrainState, score: float) -> None:
        path = os.path.join(self._best_dir,
                            f"step_{int(jax.device_get(state.step))}")
        payload = dict(_state_payload(state))
        payload["best_score"] = np.float32(score)
        # remove a previous best (single best kept, like the reference)
        if os.path.isdir(self._best_dir):
            import shutil
            for d in os.listdir(self._best_dir):
                shutil.rmtree(os.path.join(self._best_dir, d),
                              ignore_errors=True)
        self._ckptr.save(path, payload)
        self._ckptr.wait_until_finished()
        with open(os.path.join(self._best_dir, "best_score.txt"), "w") as f:
            f.write(f"{score} step {int(jax.device_get(state.step))}\n")

    def restore_best(self, state: TrainState) -> Optional[TrainState]:
        if not os.path.isdir(self._best_dir):
            return None
        dirs = [d for d in os.listdir(self._best_dir)
                if d.startswith("step_")]
        if not dirs:
            return None
        path = os.path.join(self._best_dir, dirs[0])
        target = jax.tree.map(np.asarray, _state_payload(state))
        payload = self._ckptr.restore(path, target=target)
        return state.replace(**payload)

    def wait(self):
        """Block until in-flight async rolling saves are durable. The
        train loop calls this before returning: a process exiting with
        a save still in flight leaves only an orbax tmp dir behind (no
        checkpoint) — caught by the CLI verify drive."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()

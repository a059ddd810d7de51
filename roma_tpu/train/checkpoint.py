"""Checkpoint/resume via orbax: async save, true latest-pointer, all-host
restore.

Replaces the reference CheckPoint
(/root/reference/romatch/checkpointing/checkpoint.py:10-91), whose
auto-resume is broken upstream (`load` looks for a `_latest.pth` that `save`
never writes — checkpoint.py:44 vs :34). Orbax's CheckpointManager maintains
the latest-step pointer natively and restores on every host.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckPoint:
    def __init__(self, dir: str, name: str = "model", keep: int = 3):
        self.root = os.path.abspath(os.path.join(dir, name))
        os.makedirs(self.root, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.root,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, state: Any, step: int | None = None) -> int:
        step = int(step if step is not None else state.step)
        self.manager.save(step, args=ocp.args.StandardSave(_to_savable(state)))
        return step

    def wait(self):
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def load(self, state: Any, step: int | None = None) -> Any:
        """Restore into the structure of `state`; returns `state` unchanged if
        no checkpoint exists (fresh start)."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return state
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(_to_savable(state))
        )
        return _from_savable(state, restored)


def _to_savable(state: Any):
    """TrainState -> plain pytree dict (drop static fields like tx/apply_fn)."""
    if hasattr(state, "params"):
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
    return state


def _from_savable(template: Any, restored):
    if hasattr(template, "params"):
        return template.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
    return restored

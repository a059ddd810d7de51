"""Training telemetry: JSONL metrics log + stdout summaries.

Replaces the reference's wandb calls hard-wired inside loss modules and the
train loop (robust_loss.py:60,79,99; train/train.py:20-33). Losses here
return metric dicts; this logger is the single sink. Process-0 gating
replaces the reference's RANK-based wandb disabling.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping

import jax


class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "train", every: int = 50):
        self.enabled = jax.process_index() == 0
        self.every = every
        self._file = None
        if self.enabled:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, f"{name}.jsonl"), "a")
        self._t0 = time.time()

    def log(self, step: int, metrics: Mapping[str, object], force: bool = False):
        if not self.enabled or (step % self.every and not force):
            return
        row = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self._file.write(json.dumps(row) + "\n")
        self._file.flush()

    def close(self):
        if self._file:
            self._file.close()

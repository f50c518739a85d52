"""Metrics logging: stdout + JSONL, TensorBoard when available.

The reference logs per-step losses with print(flush=True) and TensorBoard
scalars (train_v2.py:271-336). TensorFlow isn't a dependency here, so the
durable sink is a JSONL file (one {"step", "tag", "value"} row per
scalar) that any dashboard can tail; tensorboardX is used when present.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, log_dir: str, also_stdout: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.also_stdout = also_stdout
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # optional
            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, float],
            prefix: str = "") -> None:
        now = time.time()
        for tag, value in scalars.items():
            full = f"{prefix}{tag}"
            self._f.write(json.dumps(
                {"step": int(step), "tag": full, "value": float(value),
                 "ts": now}) + "\n")
            if self._tb is not None:
                self._tb.add_scalar(full, float(value), int(step))
        self._f.flush()
        if self.also_stdout:
            msg = " ".join(f"{k}={float(v):.5g}"
                           for k, v in scalars.items())
            print(f"[step {step}] {prefix}{msg}", flush=True)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()

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


def prepare_eval_dir(output_dir: str, config_items: Dict,
                     timestamp: bool = True) -> str:
    """Timestamped eval run dir + full config dump, the reference's
    test.py:589-598 semantics: artifacts of each run land in
    `<output_dir>/<YYYY-mm-dd-HH-MM-SS>/` with a `config.txt` listing
    every config key (incl. CLI overlays) between start/end markers.
    """
    run_dir = (os.path.join(output_dir, time.strftime("%Y-%m-%d-%H-%M-%S"))
               if timestamp else output_dir)
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.txt"), "w") as f:
        f.write("------------------ start ------------------\n")
        for k, v in config_items.items():
            f.write(f"{k} : {v}\n")
        f.write("------------------- end -------------------")
    return run_dir


class TeeOutput:
    """Duplicate stdout+stderr into `<run_dir>/log.txt` for the duration
    of a `with` block.

    The reference redirects both wholesale (test.py:600-602,
    `sys.stdout = f`); tee-ing keeps console visibility while producing
    the same auditable log artifact. The file opens in append mode so
    writes interleave safely with run_test's own metric appends.
    """

    def __init__(self, log_path: str):
        self.log_path = log_path

    def __enter__(self):
        import sys
        self._stdout, self._stderr = sys.stdout, sys.stderr
        self._f = open(self.log_path, "a")

        class _Tee:
            def __init__(self, a, b):
                self._a, self._b = a, b

            def write(self, s):
                self._a.write(s)
                if not self._b.closed:
                    self._b.write(s)
                return len(s)

            def flush(self):
                self._a.flush()
                if not self._b.closed:
                    self._b.flush()

            def close(self):
                # Libraries (absl logging) may capture this object as
                # their stream and close it at exit; never close the
                # real console, just flush.
                self.flush()

            def isatty(self):
                return False

            def fileno(self):  # some libs probe this; give the console's
                return self._a.fileno()

        import sys as _sys
        _sys.stdout = _Tee(self._stdout, self._f)
        _sys.stderr = _Tee(self._stderr, self._f)
        return self

    def __exit__(self, *exc):
        import sys
        sys.stdout, sys.stderr = self._stdout, self._stderr
        self._f.close()
        return False

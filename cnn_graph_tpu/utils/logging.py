"""Experiment metrics logging.

The reference's observability is print statements plus (in gconvRNN only)
working ``tf.summary`` writers (gconvRNN.py:342-358) and pipe-delimited
hyperparameter log lines (gconv_lstm.py:261-263).  This module provides
the equivalent as a structured JSONL metrics stream that tools (and the
ModelPerf harness) can consume, with optional step timing.
"""

from __future__ import annotations

import json
import os
import time

__all__ = ["MetricsLogger"]


class MetricsLogger:
    """Append-only JSONL metrics writer.

    Each ``log(step, **metrics)`` call writes one line:
    ``{"step": ..., "time": ..., **metrics}``.  ``scalars`` keeps the
    in-memory history per key for plotting.
    """

    def __init__(self, path: str | None = None, run_name: str = "run"):
        self.path = path
        self.run_name = run_name
        self.scalars: dict[str, list] = {}
        self._t0 = time.time()
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")
            self._write({"event": "start", "run": run_name})

    def _write(self, record: dict):
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()

    def log(self, step: int, **metrics):
        for k, v in metrics.items():
            self.scalars.setdefault(k, []).append((step, v))
        self._write(
            {"step": step, "time": round(time.time() - self._t0, 3), **metrics}
        )

    def log_params(self, params: dict):
        self._write({"event": "params", **params})

    def close(self):
        if self._fh:
            self._write({"event": "end"})
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

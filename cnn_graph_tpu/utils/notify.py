"""Completion notifications for long-running experiments.

The reference pings an HTTP endpoint when a sweep finishes
(``CoreUtils.SendNotification``, nips2016/humanflow.py:54-57,186 — a
dependency not even present in its repo).  Here notification sinks are
pluggable and default to local ones, since this environment has no
network egress: ``file`` appends JSONL to a notifications file, ``print``
writes to stdout, ``http`` POSTs JSON when a URL is configured and the
network allows it (failures never propagate into the experiment).
"""

from __future__ import annotations

import json
import os
import time

__all__ = ["send_notification"]


def send_notification(message: str, sink: str | None = None, **fields):
    """Best-effort notification; never raises.

    ``sink``: ``print`` (default), ``file:<path>``, or ``http:<url>``.
    Configure globally with the ``CNN_GRAPH_NOTIFY`` env var.
    """
    sink = sink or os.environ.get("CNN_GRAPH_NOTIFY", "print")
    record = {"time": time.strftime("%Y-%m-%d %H:%M:%S"),
              "message": message, **fields}
    try:
        if sink.startswith("file:"):
            with open(sink[5:], "a") as f:
                f.write(json.dumps(record) + "\n")
        elif sink.startswith("http:") or sink.startswith("https:"):
            import urllib.request

            req = urllib.request.Request(
                sink, data=json.dumps(record).encode(),
                headers={"Content-Type": "application/json"},
            )
            urllib.request.urlopen(req, timeout=5)
        else:
            print(f"[notify] {record}")
        return True
    except Exception:
        return False

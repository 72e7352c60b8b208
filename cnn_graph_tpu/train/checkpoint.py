"""Checkpoint / resume via Orbax.

The reference's ``tf.train.Saver`` checkpointing exists but is commented
out (lib/graph_model.py:58, 130-132, 189-190, 322-323) — models only live
in-memory.  This module supplies the intended capability: periodic saves of
``(params, opt_state, step)`` with retention, and restart-resume.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin wrapper over ``orbax.checkpoint.CheckpointManager`` holding the
    train state as a composite of params / opt_state / step."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
            ),
        )

    def save(self, step: int, params: Any, opt_state: Any) -> bool:
        saved = self._mngr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )
        return bool(saved)

    def restore(self, params_like: Any, opt_state_like: Any, step: int | None = None):
        """Restore ``(params, opt_state, step)``; pytree templates give the
        structure/shardings.  ``step=None`` restores the latest."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError("no checkpoint found")
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params_like),
                opt_state=ocp.args.StandardRestore(opt_state_like),
            ),
        )
        return restored["params"], restored["opt_state"], step

    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()

"""Orbax checkpointing: full train-state save/restore.

Upgrades the reference's save-only ``torch.save(state_dict)`` best-model
checkpointing (``baseline.py:311-318``; no optimizer state, no resume —
SURVEY.md section 5) to full-state checkpoints with best-metric tracking and
resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ``orbax.checkpoint.CheckpointManager``.

    Saves the full train state pytree plus metadata; ``best_mode`` retains
    the best-metric step like the reference's best-model .pth.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 best_metric: Optional[str] = None, best_mode: str = "max"):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m[best_metric]) if best_metric else None,
            best_mode=best_mode,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or {})

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(state_template))

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    @property
    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

"""Checkpoint / resume via Orbax.

The reference has no working checkpointing (an unused save_checkpoint
helper, utils/general_utils.py:101-106, and a dead --save_every flag,
utils/config.py:93-94; only a final state blob in the integrated driver,
maxk_gnn_integrated.py:329-333). Here save-every-N and resume are
first-class: params, optimizer state, batch stats, epoch counter and the
best-metric trackers are all restored, so a resumed run continues the
best-val bookkeeping exactly.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str | os.PathLike, max_to_keep: int = 3):
        self._dir = Path(ckpt_dir).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> tuple[Any, int]:
        """Restore into the template's structure; returns (state, step)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {self._dir}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def close(self):
        self._mgr.close()

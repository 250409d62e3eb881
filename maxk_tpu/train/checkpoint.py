"""Checkpoint / resume via Orbax.

The reference has no working checkpointing (an unused save_checkpoint
helper, utils/general_utils.py:101-106, and a dead --save_every flag,
utils/config.py:93-94; only a final state blob in the integrated driver,
maxk_gnn_integrated.py:329-333). Here save-every-N and resume are
first-class: params, optimizer state, batch stats and epoch counter go
through Orbax, and the training-loop bookkeeping (best-val/best-test
trackers, patience counter) rides alongside as a JSON `extra` blob per
step, so a resumed run continues best-val tracking and early-stop state
exactly (tests/test_train.py::test_checkpoint_resume_best).
"""

from __future__ import annotations

import json
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

    def _extra_path(self, step: int) -> Path:
        return self._dir / f"extra_{step}.json"

    def save(self, step: int, state: Any,
             extra: Optional[dict] = None) -> None:
        # Multi-host: every process calls save (Orbax coordinates the
        # collective write); the JSON sidecar is process-0-only so a
        # shared filesystem never sees racing writers.
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        if extra is not None and jax.process_index() == 0:
            self._extra_path(step).write_text(json.dumps(extra))

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

    def restore_extra(self, step: Optional[int] = None) -> Optional[dict]:
        """Loop bookkeeping saved next to `step` (None when absent)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        p = self._extra_path(step)
        return json.loads(p.read_text()) if p.exists() else None

    def close(self):
        self._mgr.close()

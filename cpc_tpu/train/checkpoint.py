"""Checkpoint/resume via orbax (SURVEY.md §6.3-6.4).

The reference does manual torch.save of model+optimizer state_dicts at
intervals (SURVEY.md §3 "Snapshots"); here an orbax CheckpointManager saves
{params, opt_state, step, batcher state} asynchronously and resume is exact:
the data iterator continues at the next batch of the right epoch, and
optimizer state continuation is bitwise (tested in
tests/test_train_integration.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=opts)

    def save(self, step: int, params, opt_state, batcher_state: Dict,
             extra: Optional[Dict] = None) -> None:
        payload = {
            "params": params,
            "opt_state": opt_state,
            "meta": {
                "step": int(step),
                "batcher": {k: int(v) for k, v in batcher_state.items()},
                **(extra or {}),
            },
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def restore_latest(self, params_like, opt_state_like
                       ) -> Optional[Tuple[Any, Any, int, Dict]]:
        """Returns (params, opt_state, step, batcher_state) or None."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        target = {
            "params": params_like,
            "opt_state": opt_state_like,
            "meta": {
                "step": 0,
                "batcher": {"seed": 0, "epoch": 0, "pos": 0},
            },
        }
        restored = self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(target))
        meta = restored["meta"]
        batcher = {k: int(v) for k, v in meta["batcher"].items()}
        return restored["params"], restored["opt_state"], int(meta["step"]), batcher

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

"""Orbax checkpointing: async save, latest-step resume (SURVEY.md §6).

Reference equivalent: `torch.save({'epoch', 'model', 'optimizer'})` +
`--resume` (SURVEY.md §3 "Checkpointing"); here a CheckpointManager holds
{params, opt_state, step} with retention and auto-resume from the latest
step — the elastic-recovery story the reference lacks.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3,
                 save_interval_steps: int = 1):
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    def should_save(self, step: int) -> bool:
        """True iff a save() at this step would persist (interval hit and
        step not already on disk) — lets callers skip the device→host
        state fetch otherwise."""
        return step not in self._mgr.all_steps() and self._mgr.should_save(
            step
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        if step in self._mgr.all_steps():
            return False  # already persisted (e.g. final save after loop)
        return self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None,
                partial: bool = False) -> Any:
        """Restore into `state_template`'s structure. `partial=True` allows
        the template to be a subtree of what's on disk (e.g. stage 2 loading
        only `params` from a stage-1 {params, opt_state, step} checkpoint)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        if partial:
            return self._mgr.restore(
                step,
                args=ocp.args.PyTreeRestore(
                    state_template, partial_restore=True
                ),
            )
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()

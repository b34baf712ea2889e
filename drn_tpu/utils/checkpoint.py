"""Orbax checkpointing: async save, latest-step resume (SURVEY.md §6).

Reference equivalent: `torch.save({'epoch', 'model', 'optimizer'})` +
`--resume` (SURVEY.md §3 "Checkpointing"); here a CheckpointManager holds
{params, opt_state, step} with retention and auto-resume from the latest
step — the elastic-recovery story the reference lacks.
"""

from __future__ import annotations

import math
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


BEST_SUBDIR = "best"
_LOADER_SUBDIR = "loader_state"


def save_loader_state(directory: str, step: int, blob: bytes,
                      process_index: int = 0, keep: int = 3) -> None:
    """Persist a data-loader iterator state blob (e.g. Grain's
    `get_state()`) next to the Orbax step so a mid-epoch resume can skip
    consumed batches without re-reading them. One file per process (each
    process owns its own Grain shard iterator); prunes this process's
    blobs beyond the newest `keep`."""
    d = os.path.join(directory, _LOADER_SUBDIR)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{step}_p{process_index}.bin"), "wb") as f:
        f.write(blob)
    suffix = f"_p{process_index}.bin"
    mine = sorted(
        (int(name[: -len(suffix)]) for name in os.listdir(d)
         if name.endswith(suffix) and name[: -len(suffix)].isdigit()),
    )
    for old in mine[:-keep]:
        try:
            os.remove(os.path.join(d, f"{old}{suffix}"))
        except OSError:
            pass


def load_loader_state(directory: str, step: int,
                      process_index: int = 0) -> Optional[bytes]:
    path = os.path.join(directory, _LOADER_SUBDIR,
                        f"{step}_p{process_index}.bin")
    try:
        with open(path, "rb") as f:
            return f.read()
    except OSError:
        return None


def prefer_best_dir(directory: str, prefer: bool = True) -> str:
    """Resolve a checkpoint directory for READING params: `<dir>/best` when
    a best-on-val checkpoint exists there (the reference recipe's "best"
    checkpoint, SURVEY.md §3 Checkpointing), else `directory` unchanged."""
    best = os.path.join(directory, BEST_SUBDIR)
    if prefer and os.path.isdir(best):
        try:
            if any(name.isdigit() for name in os.listdir(best)):
                return best
        except OSError:
            pass
    return directory


class BestCheckpointTracker:
    """Keeps the single best-on-val checkpoint under `<directory>/best`.

    Stores {params, step, val_metric}; the metric survives restarts, so a
    resumed run can't overwrite a better checkpoint from before the
    restart with a worse one."""

    def __init__(self, directory: str):
        self.directory = os.path.join(os.path.abspath(directory),
                                      BEST_SUBDIR)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1,
                enable_async_checkpointing=True,
            ),
        )
        self._best: Optional[float] = None
        step = self._mgr.latest_step()
        if step is not None:
            restored = self._mgr.restore(
                step,
                args=ocp.args.PyTreeRestore(
                    {"val_metric": 0.0}, partial_restore=True
                ),
            )
            m = float(restored["val_metric"])
            # A non-finite persisted metric (older runs could write one)
            # must not become the comparison anchor — NaN makes every
            # `<=` False and turns "best" into "last".
            self._best = m if math.isfinite(m) else None

    @property
    def best_metric(self) -> Optional[float]:
        return self._best

    def update(self, step: int, params: Any, val_metric: float) -> bool:
        """Persist {params, step, val_metric} iff this is a new best.

        A non-finite metric (diverged eval) is never "best": accepting a
        NaN would poison every later comparison (`m <= nan` is False) and
        silently degrade best-on-val into last-eval."""
        m = float(val_metric)
        if not math.isfinite(m):
            return False
        if self._best is not None and m <= self._best:
            return False
        self._best = m
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(
                {"params": params, "step": step, "val_metric": m}
            ),
            force=True,
        )
        return True

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()

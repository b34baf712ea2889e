"""Graceful-preemption guard: SIGTERM → save a checkpoint → clean exit.

TPU pods (and most cluster schedulers) announce preemption by delivering
SIGTERM with a grace period. The reference's training loop has no handler
— a preempted run loses everything since the last periodic save
(SURVEY.md §3 "Checkpointing": per-epoch `torch.save`). Here the trainer
finishes the in-flight step, force-saves {params, opt_state, step} plus
the data-iterator position, and exits cleanly so `--resume` continues
from the exact step.

Two coordination regimes:

- Single process: a plain signal-handler flag, checked once per step.
- Multi process (`jax.process_count() > 1`): per-process flags are NOT
  enough — processes observe the signal at different steps, and a
  collective Orbax save at mismatched steps deadlocks. Defer to the JAX
  coordination service's preemption sync point
  (`multihost_utils.reached_preemption_sync_point`), which
  `jax.distributed.initialize()` wires to SIGTERM via XLA's C-level
  PreemptionNotifier: every process agrees on the SAME step to act at.
  The guard installs NO Python handler in this regime — it would replace
  the C-level one (which `signal.getsignal` cannot see or chain) and
  starve the sync point.
"""

from __future__ import annotations

import signal
import threading
from typing import Optional

import jax


class PreemptionGuard:
    """Install with `install()` (or as a context manager); poll
    `preempted_at(step)` once per training step; `triggered` stays True
    after a hit so callers can report the stop after the loop."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._flag = threading.Event()
        self._prev: dict = {}
        self.triggered = False
        self.installed = False
        self._warned_no_sync = False

    # -- lifecycle ---------------------------------------------------------

    def install(self) -> "PreemptionGuard":
        """Chain our flag-setter in front of any existing handler. Signal
        handlers only work in the main thread — elsewhere (e.g. a train()
        driven from a worker thread) degrade to never-triggering rather
        than crash.

        Multi-process: do NOT touch the handler at all. XLA's
        PreemptionNotifier registers its SIGTERM handler at the C level
        (invisible to `signal.getsignal`, so chaining can't preserve it);
        a Python handler would REPLACE it and starve the coordination
        service's sync point — the only safe stop signal multi-process
        has. `preempted_at` polls that sync point instead."""
        if jax.process_count() > 1:
            return self
        try:
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._on_signal)
            self.installed = True
        except ValueError:  # not the main thread
            self._prev.clear()
        return self

    def uninstall(self) -> None:
        for s, prev in self._prev.items():
            try:
                signal.signal(s, prev)
            except (ValueError, TypeError):
                pass
        self._prev.clear()
        self.installed = False

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> None:
        self.uninstall()

    # -- signal path -------------------------------------------------------

    def _on_signal(self, signum, frame):
        self._flag.set()
        prev = self._prev.get(signum)
        if callable(prev):  # keep any pre-existing Python handler working
            prev(signum, frame)

    # -- per-step poll -----------------------------------------------------

    def preempted_at(self, step: int) -> bool:
        """True once the run should stop and save at `step`.

        Multi-process: only the coordination-service sync point counts
        (all processes return True at the same step). Single-process:
        the local flag is authoritative."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            try:
                hit = bool(
                    multihost_utils.reached_preemption_sync_point(step)
                )
            except RuntimeError:
                # preemption service disabled (jax_enable_preemption_service
                # off): no safe coordinated stop exists — behave as before
                # this feature (hard preemption), never half-coordinate.
                if not self._warned_no_sync:
                    self._warned_no_sync = True
                    import warnings

                    warnings.warn(
                        "multi-process run without a preemption sync "
                        "manager: SIGTERM will NOT checkpoint gracefully")
                hit = False
        else:
            hit = self._flag.is_set()
        if hit:
            self.triggered = True
        return hit


# sysexits.h EX_TEMPFAIL: "temporary failure, retry later" — restart
# loops (systemd, k8s, GKE jobset) can key resubmission on it.
PREEMPTED_EXIT_CODE = 75


def exit_code_for(guard: Optional[PreemptionGuard]) -> int:
    return PREEMPTED_EXIT_CODE if guard is not None and guard.triggered else 0

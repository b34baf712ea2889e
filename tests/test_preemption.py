"""Graceful preemption: SIGTERM → finish the step → save → exit 75.

The reference's loop has no preemption handling (SURVEY.md §3: per-epoch
torch.save only) — a preempted run replays everything since the last
periodic save. Here the guard turns the cluster's SIGTERM notice into a
force-save at the exact step plus a clean EX_TEMPFAIL exit, and --resume
continues from it.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from drn_tpu.utils.preemption import (PREEMPTED_EXIT_CODE, PreemptionGuard,
                                      exit_code_for)

REPO = __file__.rsplit("/tests/", 1)[0]


def test_guard_flags_after_sigterm_and_uninstalls():
    prev = signal.getsignal(signal.SIGTERM)
    seen = []

    def base_handler(s, f):
        seen.append(s)

    signal.signal(signal.SIGTERM, base_handler)
    try:
        with PreemptionGuard() as g:
            assert g.preempted_at(1) is False
            os.kill(os.getpid(), signal.SIGTERM)
            deadline = time.time() + 5
            while not g.preempted_at(2) and time.time() < deadline:
                time.sleep(0.01)
            assert g.preempted_at(2) is True and g.triggered
            # the pre-existing handler must have been chained, not eaten
            assert seen == [signal.SIGTERM]
        # uninstalled: the pre-guard handler is back in place
        assert signal.getsignal(signal.SIGTERM) is base_handler
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_exit_code_for():
    g = PreemptionGuard()
    assert exit_code_for(None) == 0
    assert exit_code_for(g) == 0
    g.triggered = True
    assert exit_code_for(g) == PREEMPTED_EXIT_CODE == 75


def test_guard_degrades_off_main_thread():
    import threading

    out = {}

    def worker():
        g = PreemptionGuard().install()
        out["installed"] = g.installed
        out["hit"] = g.preempted_at(1)
        g.uninstall()

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert out == {"installed": False, "hit": False}


def _spawn_trainer(ckpt_dir, max_steps=10_000):
    # The sandbox pins JAX_PLATFORMS=axon and the env var alone cannot
    # override it — force CPU via jax.config like conftest does.
    code = (
        "import os, sys\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from drn_tpu.train import main\n"
        f"main(['--config', 'synthetic_tiny', '--epochs', '50',\n"
        f"      '--max-steps', '{max_steps}',\n"
        f"      '--checkpoint-dir', {str(ckpt_dir)!r}])\n"
    )
    return subprocess.Popen(
        [sys.executable, "-u", "-c", code],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
    )


@pytest.mark.slow
def test_sigterm_saves_checkpoint_and_exits_75_then_resumes(tmp_path):
    ckpt_dir = tmp_path / "ckpt"
    import threading

    proc = _spawn_trainer(ckpt_dir)
    killer = threading.Timer(420, proc.kill)  # CPU compile headroom
    killer.start()
    saved_step = None
    try:
        # Wait for training to actually be stepping (step-1 log line),
        # then deliver the preemption notice.
        stepping = False
        for line in proc.stderr:
            if not stepping and '"step": 1' in line:
                stepping = True
                proc.send_signal(signal.SIGTERM)
            if '"preempted"' in line:
                saved_step = json.loads(line)["step"]
        rc = proc.wait(timeout=120)
    finally:
        killer.cancel()
        if proc.poll() is None:
            proc.kill()
    assert rc == PREEMPTED_EXIT_CODE, rc
    assert saved_step is not None and saved_step >= 1

    # The preemption checkpoint is on disk at that exact step.
    stage_dir = ckpt_dir / "synthetic_tiny" / "stage1"
    steps = sorted(int(p.name) for p in stage_dir.iterdir()
                   if p.name.isdigit())
    assert saved_step in steps, (saved_step, steps)

    # And a resume run continues PAST it (resume=True is the config
    # default) rather than restarting from scratch: its final save lands
    # at saved_step + 3, and saved_step's params are never recomputed.
    proc2 = _spawn_trainer(ckpt_dir, max_steps=saved_step + 3)
    killer2 = threading.Timer(420, proc2.kill)
    killer2.start()
    try:
        err = proc2.stderr.read()
        rc2 = proc2.wait(timeout=120)
    finally:
        killer2.cancel()
        if proc2.poll() is None:
            proc2.kill()
    assert rc2 == 0, err[-2000:]
    steps_after = sorted(int(p.name) for p in stage_dir.iterdir()
                         if p.name.isdigit())
    assert saved_step + 3 in steps_after, (saved_step, steps_after)


def test_multiprocess_mode_installs_no_handler_and_polls_sync_point(
        monkeypatch):
    """Multi-process: XLA's C-level PreemptionNotifier owns SIGTERM (a
    Python handler would replace it invisibly and starve the sync point),
    so install() must be a no-op and preempted_at must poll the
    coordination service only — a local SIGTERM flag could trigger a
    collective save at mismatched steps and deadlock."""
    import jax

    from drn_tpu.utils import preemption as P

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    prev = signal.getsignal(signal.SIGTERM)
    g = P.PreemptionGuard().install()
    try:
        assert g.installed is False
        assert signal.getsignal(signal.SIGTERM) is prev  # untouched
        # Without a distributed client the sync point reports False
        # (jax returns early) — never a local-flag fallback.
        g._flag.set()
        assert g.preempted_at(7) is False
    finally:
        g.uninstall()

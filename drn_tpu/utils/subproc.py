"""Run a child process with a stall watchdog (relay-drop armor).

The sandbox TPU relay occasionally drops a remote request, leaving the
issuing process blocked forever with no output. Supervisors (bench.py's
outer attempt loop, scripts/tpu_run.py) share this one implementation of
stream-the-output / kill-on-silence rather than keeping two copies of the
pump-thread + idle-timer logic in sync.
"""

from __future__ import annotations

import os
import signal
import subprocess
import threading
import time
from typing import Callable, Optional, Tuple

# Prebound at import time so the post-fork hook below does no imports and
# no attribute lookups — between fork and exec only async-signal-safe work
# is truly safe, and the parent may hold JAX/numpy thread locks.
try:
    import ctypes

    _LIBC_PRCTL = ctypes.CDLL(None, use_errno=True).prctl
except Exception:  # non-Linux / no libc: lose the belt, keep the braces
    _LIBC_PRCTL = None
_PR_SET_PDEATHSIG = 1


def run_with_watchdog(
    cmd,
    timeout: float,
    stall_timeout: float,
    on_line: Callable[[str, bool], None],
    merge_stderr: bool = False,
) -> Tuple[Optional[str], Optional[int]]:
    """Run `cmd`, streaming every output line to `on_line(line, is_stdout)`.

    Kills the child when it exceeds `timeout` s total, or goes
    `stall_timeout` s without producing any output (the signature of a
    dropped remote request, which otherwise waits forever).

    Returns `(why, returncode)`: `why` is None on normal exit, else a
    human-readable kill reason.
    """
    # Own session => the child's whole process tree shares one process
    # group we can kill. Killing only the direct child would orphan
    # grandchildren (e.g. bench.py's --inner measurement process), which
    # would keep dispatching work to the single relay-attached TPU while
    # the retry attempt runs.
    #
    # PDEATHSIG covers the inverse direction: if THIS supervisor is killed
    # externally (the round driver's timeout), the kernel SIGKILLs the
    # child. This must be kernel-side: a Python-level orphan watcher
    # thread was observed starved for minutes while the child's main
    # thread blocked in axon backend init holding the GIL.
    def _die_with_parent():  # runs in the forked child, pre-exec
        if _LIBC_PRCTL is not None:
            _LIBC_PRCTL(_PR_SET_PDEATHSIG, int(signal.SIGKILL))

    proc = subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT if merge_stderr else subprocess.PIPE,
        text=True,
        bufsize=1,
        start_new_session=True,
        preexec_fn=_die_with_parent,
    )

    def kill_tree():
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()  # group already gone or not ours: direct kill

    state = {"last_activity": time.time()}
    lock = threading.Lock()

    def pump(stream, is_stdout):
        for line in stream:
            with lock:
                state["last_activity"] = time.time()
            on_line(line, is_stdout)

    threads = [
        threading.Thread(target=pump, args=(proc.stdout, True), daemon=True)
    ]
    if not merge_stderr:
        threads.append(
            threading.Thread(target=pump, args=(proc.stderr, False),
                             daemon=True)
        )
    for t in threads:
        t.start()

    t_start = time.time()
    why = None
    while proc.poll() is None:
        now = time.time()
        with lock:
            idle = now - state["last_activity"]
        if now - t_start > timeout:
            why = f"total timeout ({timeout:.0f}s)"
        elif idle > stall_timeout:
            why = (f"stalled {stall_timeout:.0f}s with no output "
                   f"(likely dropped remote request)")
        if why:
            kill_tree()
            break
        time.sleep(1)
    proc.wait()
    for t in threads:
        t.join(timeout=5)
    return why, proc.returncode

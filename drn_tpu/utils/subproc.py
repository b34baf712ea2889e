"""Run a child process with a stall watchdog (relay-drop armor).

The sandbox TPU relay occasionally drops a remote request, leaving the
issuing process blocked forever with no output. Supervisors (bench.py's
outer attempt loop, scripts/tpu_run.py) share this one implementation of
stream-the-output / kill-on-silence rather than keeping two copies of the
pump-thread + idle-timer logic in sync.
"""

from __future__ import annotations

import subprocess
import threading
import time
from typing import Callable, Optional, Tuple


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
    proc = subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT if merge_stderr else subprocess.PIPE,
        text=True,
        bufsize=1,
    )
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
            proc.kill()
            break
        time.sleep(1)
    proc.wait()
    for t in threads:
        t.join(timeout=5)
    return why, proc.returncode

"""Run a command with a stall watchdog + retries (relay-drop armor).

The sandbox TPU relay occasionally drops a remote request, leaving the
process blocked forever (CLAUDE.md). This wrapper streams the child's
output, kills it after --stall seconds with no output, and retries the
identical command — the documented recovery.

    python scripts/tpu_run.py [--stall 300] [--attempts 3] -- cmd args...
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import threading
import time


def run_once(cmd, stall: int, timeout: int) -> int:
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, bufsize=1)
    last = [time.time()]

    def pump():
        for line in proc.stdout:
            last[0] = time.time()
            sys.stdout.write(line)
            sys.stdout.flush()

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    t0 = time.time()
    while proc.poll() is None:
        now = time.time()
        if now - last[0] > stall:
            print(f"[tpu_run] no output for {stall}s (likely dropped "
                  f"remote request); killing", file=sys.stderr, flush=True)
            proc.kill()
            proc.wait()
            return -1
        if now - t0 > timeout:
            print(f"[tpu_run] total timeout {timeout}s; killing",
                  file=sys.stderr, flush=True)
            proc.kill()
            proc.wait()
            return -2
        time.sleep(1)
    t.join(timeout=5)
    return proc.returncode


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stall", type=int, default=300)
    p.add_argument("--timeout", type=int, default=1800)
    p.add_argument("--attempts", type=int, default=3)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- command to run")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given")
    for i in range(args.attempts):
        rc = run_once(cmd, args.stall, args.timeout)
        if rc == 0:
            sys.exit(0)
        print(f"[tpu_run] attempt {i + 1} rc={rc}; "
              f"{'retrying' if i + 1 < args.attempts else 'giving up'}",
              file=sys.stderr, flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()

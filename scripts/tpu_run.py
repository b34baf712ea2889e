"""Run a command with a stall watchdog + retries (relay-drop armor).

The sandbox TPU relay occasionally drops a remote request, leaving the
process blocked forever (CLAUDE.md). This wrapper streams the child's
output, kills it after --stall seconds with no output, and retries the
identical command — the documented recovery. The watchdog implementation
is shared with bench.py's outer supervisor
(drn_tpu.utils.subproc.run_with_watchdog).

    python scripts/tpu_run.py [--stall 300] [--attempts 3] -- cmd args...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drn_tpu.utils.subproc import run_with_watchdog  # noqa: E402


def run_once(cmd, stall: int, timeout: int) -> int:
    def on_line(line, is_stdout):
        sys.stdout.write(line)
        sys.stdout.flush()

    why, rc = run_with_watchdog(cmd, timeout, stall, on_line,
                                merge_stderr=True)
    if why:
        print(f"[tpu_run] {why}; killed", file=sys.stderr, flush=True)
        return -1
    return rc


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

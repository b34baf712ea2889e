"""Relay-drop armor: the child-process watchdog and the in-process
re-dispatcher.

These two pieces are what stands between the driver's `python bench.py`
run and the sandbox relay's dropped-request failure mode (a request that
never returns — CLAUDE.md); BENCH_r02 was lost to exactly this. They are
pure host logic, so they get fast direct tests with no TPU involvement.
"""

import sys
import threading
import time

import pytest

from drn_tpu.utils.subproc import run_with_watchdog


def _collect():
    lines = []

    def on_line(line, is_stdout):
        lines.append((line.rstrip("\n"), is_stdout))

    return lines, on_line


def test_watchdog_passes_through_clean_exit():
    lines, on_line = _collect()
    why, rc = run_with_watchdog(
        [sys.executable, "-S", "-c", "print('out'); "
         "import sys; print('err', file=sys.stderr)"],
        timeout=30, stall_timeout=30, on_line=on_line,
    )
    assert why is None and rc == 0
    assert ("out", True) in lines
    assert ("err", False) in lines


def test_watchdog_kills_on_stall_but_keeps_earlier_output():
    lines, on_line = _collect()
    t0 = time.time()
    why, rc = run_with_watchdog(
        [sys.executable, "-S", "-u", "-c",
         "print('alive', flush=True); import time; time.sleep(600)"],
        timeout=120, stall_timeout=3, on_line=on_line,
    )
    assert why is not None and "stalled" in why
    assert rc != 0
    assert time.time() - t0 < 60  # killed at ~stall, nowhere near timeout
    assert ("alive", True) in lines


def test_watchdog_kills_on_total_timeout_despite_output():
    # A chatty child never trips the stall detector; the total budget must.
    lines, on_line = _collect()
    why, rc = run_with_watchdog(
        [sys.executable, "-S", "-u", "-c",
         "import time\n"
         "while True: print('tick', flush=True); time.sleep(1)"],
        timeout=4, stall_timeout=30, on_line=on_line,
    )
    assert why is not None and "timeout" in why
    assert rc != 0
    assert ("tick", True) in lines


def test_watchdog_merge_stderr():
    lines, on_line = _collect()
    why, rc = run_with_watchdog(
        [sys.executable, "-S", "-c", "import sys; print('e', file=sys.stderr)"],
        timeout=30, stall_timeout=30, on_line=on_line, merge_stderr=True,
    )
    assert why is None and rc == 0
    assert ("e", True) in lines  # stderr arrives on the merged stdout pump


def _bench():
    # bench.py lives at the repo root (a script, not a package module).
    import importlib

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    return importlib.import_module("bench")


def test_redispatch_returns_first_result():
    B = _bench()
    calls = []
    out = B._with_redispatch(lambda: calls.append(1) or "ok",
                             timeout=5, tries=2, label="t")
    assert out == "ok" and len(calls) == 1


def test_redispatch_reissues_after_silent_drop():
    """First dispatch hangs forever (the dropped-request signature); the
    re-dispatched second call must succeed within the same invocation."""
    B = _bench()
    n = [0]
    hang = threading.Event()

    def fn():
        n[0] += 1
        if n[0] == 1:
            hang.wait(30)  # simulate a request the relay dropped
            return "stale"
        return "fresh"

    out = B._with_redispatch(fn, timeout=1.0, tries=3, label="t",
                             heartbeat=0.4)
    hang.set()
    assert out == "fresh" and n[0] == 2


def test_redispatch_accepts_late_result_from_first_dispatch():
    """A slow-but-NOT-dropped first request that lands during the second
    dispatch's wait must be accepted (shared result queue), not thrown
    away — relay hiccups of ~240 s that eventually complete are real."""
    B = _bench()
    n = [0]

    def fn():
        n[0] += 1
        if n[0] == 1:
            time.sleep(2.0)  # longer than timeout, shorter than 2x
            return "late-but-valid"
        time.sleep(30)  # the re-dispatch itself is the slow one this time
        return "never"

    out = B._with_redispatch(fn, timeout=1.5, tries=2, label="t",
                             heartbeat=0.5)
    assert out == "late-but-valid"


def test_redispatch_ignores_stale_failure_from_superseded_dispatch():
    """A late FAILURE from an abandoned dispatch (e.g. the dropped RPC
    finally erroring out mid-way through a healthy re-dispatch) must not
    abort the live dispatch — only same-generation failures raise."""
    B = _bench()
    n = [0]

    def fn():
        n[0] += 1
        if n[0] == 1:
            time.sleep(2.0)  # past timeout -> superseded, then fails late
            raise RuntimeError("stale RPC death")
        time.sleep(0.8)  # live dispatch: healthy, inside its window
        return "fresh"

    out = B._with_redispatch(fn, timeout=1.5, tries=2, label="t",
                             heartbeat=0.5)
    assert out == "fresh" and n[0] == 2


def test_redispatch_raises_child_exception():
    B = _bench()

    def fn():
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        B._with_redispatch(fn, timeout=5, tries=2, label="t")


def test_redispatch_stalled_after_all_tries():
    B = _bench()

    def fn():
        time.sleep(30)
        return "never"

    t0 = time.time()
    with pytest.raises(B._Stalled):
        B._with_redispatch(fn, timeout=0.3, tries=2, label="t",
                           heartbeat=0.2)
    assert time.time() - t0 < 10


def _fake_run(results):
    """subprocess.run stand-in: pops (rc, stdout) per call."""
    class R:
        def __init__(self, rc, out):
            self.returncode, self.stdout, self.stderr = rc, out, ""

    def run(cmd, **kw):
        rc, out = results.pop(0)
        return R(rc, out)

    return run


def test_all_configs_exits_nonzero_on_missing_contract_line(monkeypatch,
                                                            capsys):
    """--all-configs must not report success when a config produced no
    contract line (VERDICT r2: silent truncation reads as coverage)."""
    B = _bench()
    import types

    n_cfg = 5  # charades x2, activitynet x2, tacos
    ok = (0, '{"metric": "m", "value": 1.0, "unit": "queries/s"}\n')
    results = [ok, (1, "")] + [ok] * (n_cfg - 2)
    monkeypatch.setattr(B, "subprocess",
                        types.SimpleNamespace(run=_fake_run(results)),
                        raising=False)
    args = types.SimpleNamespace(iters=8, attempt_timeout=60,
                                 stall_timeout=30, batch_size=None,
                                 latency=False, profile=None, platform=None,
                                 serial_compile=False)
    with pytest.raises(SystemExit) as e:
        B.all_configs_main(args)
    assert e.value.code == 1
    out = capsys.readouterr().out
    assert len([l for l in out.splitlines() if l.startswith("{")]) == n_cfg - 1


def test_all_configs_forwards_latency_and_succeeds(monkeypatch, capsys):
    B = _bench()
    import types

    seen_cmds = []
    ok_line = '{"metric": "m_single_query_latency_us", "value": 140.0}\n'

    class R:
        returncode, stdout, stderr = 0, ok_line, ""

    def run(cmd, **kw):
        seen_cmds.append(cmd)
        return R()

    monkeypatch.setattr(B, "subprocess", types.SimpleNamespace(run=run),
                        raising=False)
    args = types.SimpleNamespace(iters=2048, attempt_timeout=60,
                                 stall_timeout=30, batch_size=None,
                                 latency=True, profile=None, platform=None,
                                 serial_compile=False)
    B.all_configs_main(args)  # must NOT raise SystemExit
    assert all("--latency" in c for c in seen_cmds)
    out = capsys.readouterr().out
    assert len([l for l in out.splitlines() if l.startswith("{")]) == len(
        seen_cmds)

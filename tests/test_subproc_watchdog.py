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
    # Stall windows must dwarf interpreter startup: under a saturated host
    # (full suite + concurrent compiles) a bare `python -c print(...)` has
    # been observed to take >10 s to its first line, which kills the child
    # before the output these tests assert on exists.
    lines, on_line = _collect()
    t0 = time.time()
    why, rc = run_with_watchdog(
        [sys.executable, "-S", "-u", "-c",
         "print('alive', flush=True); import time; time.sleep(600)"],
        timeout=600, stall_timeout=15, on_line=on_line,
    )
    assert why is not None and "stalled" in why
    assert rc != 0
    assert time.time() - t0 < 300  # killed at ~stall, nowhere near timeout
    assert ("alive", True) in lines


def test_watchdog_kills_on_total_timeout_despite_output():
    # A chatty child never trips the stall detector; the total budget must.
    lines, on_line = _collect()
    # timeout must cover loaded-host startup (see note above) so at least
    # one tick exists; stall_timeout stays far above the tick period so
    # only the total budget can fire.
    why, rc = run_with_watchdog(
        [sys.executable, "-S", "-u", "-c",
         "import time\n"
         "while True: print('tick', flush=True); time.sleep(1)"],
        timeout=15, stall_timeout=120, on_line=on_line,
    )
    assert why is not None and "timeout" in why
    assert rc != 0
    assert ("tick", True) in lines


def test_watchdog_kills_grandchildren_too():
    """The kill must take out the child's whole process group: a leaked
    grandchild (e.g. bench.py's --inner process) would keep dispatching
    work to the single relay-attached TPU during the retry attempt."""
    import os
    import signal

    lines, on_line = _collect()
    why, rc = run_with_watchdog(
        [sys.executable, "-u", "-c",
         "import subprocess, sys, time\n"
         "p = subprocess.Popen([sys.executable, '-c',"
         " 'import time; time.sleep(600)'])\n"
         "print('gc', p.pid, flush=True)\n"
         "time.sleep(600)\n"],
        timeout=600, stall_timeout=60, on_line=on_line,
    )
    # stall_timeout=60 ≫ loaded-host startup: with 10 s this flaked once
    # (the child was killed before Popen+print ran, so no `gc` line).
    assert why is not None and rc != 0
    gc_pid = next(int(l.split()[1]) for l, is_out in lines
                  if l.startswith("gc "))
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            os.kill(gc_pid, 0)
        except ProcessLookupError:
            return  # grandchild gone — group kill worked
        time.sleep(0.2)
    os.kill(gc_pid, signal.SIGKILL)  # clean up before failing
    pytest.fail("grandchild survived the watchdog kill")


def test_watchdog_child_dies_with_sigkilled_supervisor():
    """If the supervisor itself is SIGKILLed (the round driver's timeout),
    the kernel must take the child down via PDEATHSIG — a Python-level
    watcher can be starved for minutes by a GIL-holding blocked main
    thread (observed with axon backend init)."""
    import os
    import signal
    import subprocess

    repo = __file__.rsplit("/tests/", 1)[0]
    sup_code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from drn_tpu.utils.subproc import run_with_watchdog\n"
        "run_with_watchdog([sys.executable, '-c',\n"
        "    'import os, time; print(\"cp\", os.getpid(), flush=True);'\n"
        "    ' time.sleep(600)'],\n"
        "    timeout=300, stall_timeout=300,\n"
        "    on_line=lambda l, s: print(l, end='', flush=True))\n" % repo
    )
    sup = subprocess.Popen([sys.executable, "-u", "-c", sup_code],
                           stdout=subprocess.PIPE, text=True)
    try:
        line = sup.stdout.readline()
        assert line.startswith("cp "), line
        child_pid = int(line.split()[1])
        sup.kill()  # SIGKILL: no Python cleanup runs in the supervisor
        sup.wait()
        deadline = time.time() + 10
        while time.time() < deadline:
            try:
                os.kill(child_pid, 0)
            except ProcessLookupError:
                return  # kernel delivered PDEATHSIG — child gone
            time.sleep(0.2)
        os.kill(child_pid, signal.SIGKILL)  # clean up before failing
        pytest.fail("child outlived its SIGKILLed supervisor")
    finally:
        if sup.poll() is None:
            sup.kill()


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


def _args(**over):
    import types

    base = dict(iters=8, attempt_timeout=60, stall_timeout=30,
                batch_size=None, latency=False, profile=None, platform=None,
                serial_compile=False, relay_gate=0)
    base.update(over)
    return types.SimpleNamespace(**base)


def test_all_configs_exits_nonzero_on_missing_contract_line(monkeypatch,
                                                            capsys):
    """--all-configs must not report success when a config produced no
    contract line (VERDICT r2: silent truncation reads as coverage)."""
    B = _bench()

    n_cfg = 5  # charades x2, activitynet x2, tacos
    ok = ('{"metric": "m", "value": 1.0, "unit": "queries/s"}', None, 0)
    results = [ok, (None, "stalled", 1)] + [ok] * (n_cfg - 2)
    monkeypatch.setattr(B, "_run_attempt",
                        lambda cmd, timeout, stall_timeout: results.pop(0))
    with pytest.raises(SystemExit) as e:
        B.all_configs_main(_args())
    assert e.value.code == 1
    out = capsys.readouterr().out
    assert len([l for l in out.splitlines() if l.startswith("{")]) == n_cfg - 1


def test_all_configs_forwards_latency_and_succeeds(monkeypatch, capsys):
    B = _bench()

    seen_cmds = []
    ok_line = '{"metric": "m_single_query_latency_us", "value": 140.0}'

    def fake_attempt(cmd, timeout, stall_timeout):
        seen_cmds.append(cmd)
        return ok_line, None, 0

    monkeypatch.setattr(B, "_run_attempt", fake_attempt)
    B.all_configs_main(_args(iters=2048, latency=True))  # must NOT exit
    assert seen_cmds and all("--latency" in c for c in seen_cmds)
    out = capsys.readouterr().out
    assert len([l for l in out.splitlines() if l.startswith("{")]) == len(
        seen_cmds)


def test_inner_exits_when_supervisor_dies():
    """bench's --inner runs in its own session (group-killable), so an
    externally SIGKILLed supervisor must not leak it: the orphan watcher
    exits the inner once it reparents to init."""
    import os
    import subprocess

    repo = __file__.rsplit("/tests/", 1)[0]
    gc_code = (
        "import sys; sys.path.insert(0, %r); import bench; "
        "bench._exit_when_orphaned(0.2); import time; time.sleep(600)"
        % repo
    )
    # The parent spawns the watched grandchild, reports its pid, and dies.
    out = subprocess.run(
        [sys.executable, "-c",
         "import subprocess, sys\n"
         "p = subprocess.Popen([sys.executable, '-c', sys.argv[1]])\n"
         "print(p.pid, flush=True)\n",
         gc_code],
        capture_output=True, text=True, timeout=60,
    )
    gc_pid = int(out.stdout.strip())
    deadline = time.time() + 30  # numpy import in the grandchild is slow
    while time.time() < deadline:
        try:
            os.kill(gc_pid, 0)
        except ProcessLookupError:
            return  # inner exited on its own — orphan watcher worked
        time.sleep(0.3)
    os.kill(gc_pid, 9)  # clean up before failing
    pytest.fail("orphaned inner kept running after its supervisor died")


def test_relay_gate_retries_until_probe_succeeds(monkeypatch):
    """During an outage the gate keeps probing (cheap) instead of letting
    measurement attempts burn their full stall-timeout at backend init."""
    B = _bench()

    calls = {"n": 0}

    def fake_probe(budget_s):
        calls["n"] += 1
        return calls["n"] >= 3  # dead, dead, alive

    monkeypatch.setattr(B, "_relay_probe_ok", fake_probe)
    monkeypatch.setattr(B.time, "sleep", lambda s: None)
    assert B._await_relay(max_wait_s=3600, probe_budget_s=1) is True
    assert calls["n"] == 3


def test_relay_gate_gives_up_after_budget(monkeypatch):
    """A relay outage longer than the gate budget must NOT hold the run
    forever — the attempts remain the last chance."""
    B = _bench()

    monkeypatch.setattr(B, "_relay_probe_ok", lambda budget_s: False)
    monkeypatch.setattr(B.time, "sleep", lambda s: None)
    assert B._await_relay(max_wait_s=0.5, probe_budget_s=1) is False


def test_relay_gate_escalates_probe_budget_for_slow_relay(monkeypatch):
    """A merely-SLOW relay (probe dead at 120 s, full compiles landing in
    ~210 s — observed 2026-08-19) must pass the gate on an escalated probe
    budget instead of reading as a full outage."""
    B = _bench()

    budgets = []

    def fake_probe(budget_s):
        budgets.append(budget_s)
        return budget_s >= 240

    monkeypatch.setattr(B, "_relay_probe_ok", fake_probe)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    assert B._await_relay(max_wait_s=3600, probe_budget_s=120) is True
    assert budgets == [120, 240]


def test_relay_probe_runs_real_subprocess():
    """The probe's subprocess mechanics end-to-end — forced onto the CPU
    backend (an inherited JAX_PLATFORMS=cpu does NOT override the
    sandbox's axon pin, so without `platform` this would probe the real
    relay and flake with it)."""
    B = _bench()

    assert B._relay_probe_ok(budget_s=180, platform="cpu") is True


def test_main_regates_relay_before_every_attempt(monkeypatch, capsys):
    """A dead-relay attempt burns its full stall-timeout; probes are cheap.
    The supervisor must therefore re-check relay health before EACH retry
    (full gate budget on attempt 1, half on retries), not just once up
    front — during the 2026-08-19 outage the one-shot gate let attempts
    2-3 run straight into a still-dead relay."""
    B = _bench()

    gate_waits = []
    monkeypatch.setattr(B, "_await_relay",
                        lambda max_wait_s, **kw: gate_waits.append(max_wait_s))
    ok = ('{"metric": "m", "value": 2.0, "unit": "queries/s"}', None, 0)
    results = [(None, "stalled", 1), (None, "stalled", 1), ok]
    monkeypatch.setattr(B, "_run_attempt",
                        lambda cmd, timeout, stall_timeout: results.pop(0))
    monkeypatch.setattr(sys, "argv", ["bench.py", "--relay-gate", "600"])
    B.main()  # third attempt succeeds -> no SystemExit
    assert gate_waits == [600, 300.0, 300.0]
    out = capsys.readouterr().out
    assert [l for l in out.splitlines() if l.startswith("{")] == [ok[0]]


def test_all_configs_gates_once_and_disables_child_gates(monkeypatch,
                                                         capsys):
    """--all-configs probes the relay once up front; five healthy-relay
    probes in the children would be ~3 min of pure overhead."""
    B = _bench()

    gate_calls = []
    monkeypatch.setattr(B, "_await_relay",
                        lambda max_wait_s, probe_budget_s=120.0:
                        gate_calls.append(max_wait_s) or True)
    seen_cmds = []
    ok = ('{"metric": "m", "value": 1.0, "unit": "queries/s"}', None, 0)

    def fake_attempt(cmd, timeout, stall_timeout):
        seen_cmds.append(cmd)
        return ok

    monkeypatch.setattr(B, "_run_attempt", fake_attempt)
    B.all_configs_main(_args(relay_gate=900))
    assert gate_calls == [900]
    for cmd in seen_cmds:
        i = cmd.index("--relay-gate")
        assert cmd[i + 1] == "0"
    capsys.readouterr()


def test_apply_model_override_bool_spellings_and_rejection():
    """Boolean --model-override values must be explicit: a silent False
    on an unrecognized spelling ('yes', '2', ' True') would make the A/B
    instrument measure baseline-vs-baseline and record a fake 'no
    difference' verdict."""
    from drn_tpu.config import get_config

    bench = _bench()
    cfg = get_config("charades_c3d")
    for spelling, want in (("true", True), ("YES", True), ("1", True),
                           (" on ", True), ("false", False), ("0", False),
                           ("off", False), ("no", False)):
        out = bench.apply_model_override(cfg, f"use_pallas_fusion={spelling}")
        assert out.model.use_pallas_fusion is want, spelling
    for bad in ("2", "enabled", "", "tru"):
        with pytest.raises(SystemExit, match="not recognized"):
            bench.apply_model_override(cfg, f"use_pallas_fusion={bad}")
    # numeric fields coerce by the field's type; typos raise
    out = bench.apply_model_override(cfg, "iou_fold_mix_min_locations=0")
    assert out.model.iou_fold_mix_min_locations == 0
    with pytest.raises(AttributeError):
        bench.apply_model_override(cfg, "no_such_field=1")

"""Driver contracts: __graft_entry__ and bench.py must keep working.

The round driver compile-checks `entry()` single-chip, runs
`dryrun_multichip` on a virtual mesh, and executes `python bench.py`
expecting ONE JSON line on stdout. These smoke tests exercise the same
surfaces on the test backend so a refactor can't silently break them.
"""

import json
import subprocess
import sys

import jax
import numpy as np
import pytest


def test_entry_returns_jittable_fn():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves and all(np.isfinite(np.asarray(l, np.float32)).all()
                          for l in leaves)


@pytest.mark.slow
def test_bench_emits_one_json_line():
    # Tiny config on the CPU backend (deterministic, honest synchronous
    # timing; the relay-attached TPU turns a sub-us step into jitter).
    r = subprocess.run(
        [sys.executable, "bench.py", "--config", "synthetic_tiny",
         "--iters", "2", "--skip-torch", "--skip-train",
         "--platform", "cpu", "--attempt-timeout", "280"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    json_lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, r.stdout
    parsed = json.loads(json_lines[0])
    assert parsed["unit"] == "queries/s"
    assert parsed["value"] > 0
    assert set(parsed) >= {"metric", "value", "unit", "vs_baseline"}

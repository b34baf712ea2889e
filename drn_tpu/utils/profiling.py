"""Profiling and timing harness (SURVEY.md §6 "Tracing / profiling" —
absent in the reference; first-class here).

  * `trace(logdir)` — context manager around `jax.profiler` producing an
    XProf/Perfetto trace viewable in TensorBoard or ui.perfetto.dev.
  * `Timer` / `time_fn` — `block_until_ready`-correct wall timing for the
    queries/sec metric (async dispatch means naive timing measures only
    enqueue).
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Any, Callable, Dict, Sequence

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Profile everything inside the block into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable[..., Any], *args, iters: int = 20, warmup: int = 2,
            **kw) -> Dict[str, float]:
    """Times `fn(*args)` with proper device synchronization.

    Returns {"mean_ms", "median_ms", "min_ms", "iters"}. The warmup calls
    absorb compilation; each timed call blocks on its own result, so the
    numbers are per-call latency (for pipelined throughput, time a loop of
    N dispatches ending in one block — see bench.py).
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        samples.append((time.perf_counter() - t0) * 1e3)
    return {
        "mean_ms": statistics.fmean(samples),
        "median_ms": statistics.median(samples),
        "min_ms": min(samples),
        "iters": float(iters),
    }


def throughput(fn: Callable[..., Any], *args, items_per_call: int,
               iters: int = 20, warmup: int = 2, **kw) -> float:
    """Pipelined items/sec: N async dispatches, one final block."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return items_per_call * iters / (time.perf_counter() - t0)

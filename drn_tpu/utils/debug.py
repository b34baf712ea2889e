"""Numerical sanitizers (SURVEY.md §6 "Race detection / sanitizers").

JAX's functional model has no data races to detect; the failure modes that
replace them are NaN/Inf propagation and use-after-donation. This module
gives both a first-class switch:

  * `nan_debug()` — context manager enabling `jax_debug_nans` (every jitted
    op re-checked; raises at the op that produced the first NaN).
  * `assert_finite_tree(tree)` — host-side check of params/grads/metrics.
  * `check_metrics(metrics, step)` — cheap per-step guard for the train
    loop; raises with the offending keys.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_debug(enable: bool = True):
    """Enable jax_debug_nans inside the block (compiles uncached — slow;
    for debugging runs, not production)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite_tree(tree: Any, name: str = "tree") -> None:
    """Raise FloatingPointError naming every non-finite leaf."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.all(
            np.isfinite(arr)
        ):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def check_metrics(metrics: Dict[str, jnp.ndarray], step: int) -> None:
    """Train-loop guard: fail fast (with step number) on NaN/Inf metrics."""
    bad = [k for k, v in metrics.items()
           if not np.all(np.isfinite(np.asarray(v)))]
    if bad:
        raise FloatingPointError(
            f"non-finite training metrics at step {step}: {bad}"
        )

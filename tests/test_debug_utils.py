"""Sanitizer tests: NaN detection and donation safety of the train step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.data.pipeline import BatchIterator, make_dataset
from drn_tpu.train import build_model, init_state, make_optimizer, make_train_step
from drn_tpu.utils.debug import assert_finite_tree, check_metrics, nan_debug


def test_assert_finite_tree_flags_bad_leaf():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_finite_tree(good)
    bad = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    with pytest.raises(FloatingPointError, match="c"):
        assert_finite_tree(bad, "params")


def test_check_metrics():
    check_metrics({"loss": jnp.float32(1.0)}, step=1)
    with pytest.raises(FloatingPointError, match="loss"):
        check_metrics({"loss": jnp.float32(np.inf)}, step=2)


def test_nan_debug_context():
    with nan_debug():
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: 0.0 / x)(jnp.float32(0.0))
    assert not jax.config.jax_debug_nans


def test_train_step_donation_safety():
    """The train step donates its state; the returned state must be fresh
    and the step must stay re-invokable (use-after-donation guard)."""
    cfg = get_config("synthetic_tiny")
    ds = make_dataset(cfg.data, cfg.model)
    batch = next(BatchIterator(ds, cfg.data.batch_size).epoch(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 1), jax.random.key(0))
    step_fn = make_train_step(cfg, model, mesh=None)

    s1, m1 = step_fn(state, jb)
    s2, m2 = step_fn(s1, jb)  # chained donation
    assert int(s2.step) == 2
    check_metrics(jax.device_get(m2), 2)
    # the original donated buffers must not be readable anymore
    with pytest.raises(RuntimeError):
        np.asarray(jax.tree_util.tree_leaves(state.params)[0])

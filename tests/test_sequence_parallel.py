"""Sequence parallelism (time-axis sharding) equivalence tests.

Shards the clip axis over a "time" mesh axis; XLA's SPMD partitioner
inserts the halo exchanges the 1-D conv stencils need. Metrics must be
identical to unsharded execution (SURVEY.md §6 long-context row)."""

import dataclasses

import jax
import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.data.pipeline import BatchIterator, make_dataset
from drn_tpu.evaluate import evaluate
from drn_tpu.parallel import make_mesh
from drn_tpu.train import (build_model, init_state, make_optimizer,
                           make_train_step, put_batch, shard_state)


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("synthetic_tiny")
    ds = make_dataset(cfg.data, cfg.model, split="train")
    batch = next(BatchIterator(ds, cfg.data.batch_size).epoch(0))
    model = build_model(cfg)
    return cfg, model, batch, ds


def _fresh_state(cfg, model):
    return init_state(cfg, model, make_optimizer(cfg, 8), jax.random.key(0))


def _metrics(cfg, model, batch, mesh):
    # the train step donates its state, so build a fresh one per run
    state = _fresh_state(cfg, model)
    if mesh is not None:
        state = shard_state(state, mesh)
    step = make_train_step(cfg, model, mesh)
    _, m = step(state, put_batch(batch, mesh))
    return {k: float(v) for k, v in jax.device_get(m).items()}


def test_time_sharded_train_step_matches_unsharded(setup):
    cfg, model, batch, _ = setup
    ref = _metrics(cfg, model, batch, None)
    # 2 data x 1 model x 4 time over the virtual 8-device CPU mesh
    mesh = make_mesh(model_axis=1, time_axis=4)
    got = _metrics(cfg, model, batch, mesh)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-5, atol=1e-6), k


def test_dp_tp_sp_combined(setup):
    cfg, model, batch, _ = setup
    ref = _metrics(cfg, model, batch, None)
    mesh = make_mesh(model_axis=2, time_axis=2)  # 2 x 2 x 2
    got = _metrics(cfg, model, batch, mesh)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-5, atol=1e-6), k


def test_time_sharded_eval_matches(setup):
    cfg, model, batch, ds = setup
    state = _fresh_state(cfg, model)
    r_ref = evaluate(cfg, model, state.params, dataset=ds)
    mesh = make_mesh(model_axis=1, time_axis=4)
    r_sp = evaluate(cfg, model, state.params, dataset=ds, mesh=mesh)
    for k in r_ref:
        # Recall percentages come from integer hit counts — exact across
        # shardings (asserted tight). mIoU averages the TOP-1 candidate's
        # IoU, and argmax over scores is discontinuous: halo-exchange
        # rounding makes the sharded logits bit-different, and at the
        # default rescore blend (w=0.25, which compresses score spread)
        # that can flip an untrained model's near-tied top-1 for a query
        # or two — measured 0.038 of a percent here (one flip ≈
        # ΔIoU/N ≈ 0.1/256 ≈ 0.04), vs ~1e-3 at w=1 where only the fp32
        # reduction order differs. A real sharding bug moves mIoU by
        # points AND breaks the exact recall rows.
        atol = 0.15 if k == "mIoU" else 1e-6
        np.testing.assert_allclose(r_sp[k], r_ref[k], atol=atol), k

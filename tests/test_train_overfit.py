"""Correctness gate (SURVEY.md §8 step 3): overfit the synthetic fixture.

A healthy model + loss + assignment pipeline must drive the loss down and
reach high R@1,IoU=0.5 on a memorized subset. Runs the REAL jitted
train_step / eval_step on the CPU test backend.
"""

import dataclasses

import jax
import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.data.pipeline import BatchIterator, make_dataset
from drn_tpu.evaluate import make_eval_step
from drn_tpu.train import build_model, init_state, make_optimizer, make_train_step


@pytest.mark.slow
def test_overfit_synthetic():
    cfg = get_config("synthetic_tiny")
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, learning_rate=3e-3, stage=2,
                                 stage2_iou_only=False),
    )
    ds = make_dataset(cfg.data, cfg.model)
    ds.num_examples = 16
    ds._examples = ds._examples[:16]
    batches = BatchIterator(ds, cfg.data.batch_size, shuffle=True, seed=0)

    model = build_model(cfg)
    tx = make_optimizer(cfg, len(batches))
    state = init_state(cfg, model, tx, jax.random.key(0))
    train_step = make_train_step(cfg, model, mesh=None)

    first_loss, last_metrics = None, None
    step = 0
    for epoch in range(120):
        for batch in batches.epoch(epoch):
            jb = {k: jax.numpy.asarray(v) for k, v in batch.items()}
            state, metrics = train_step(state, jb)
            if first_loss is None:
                first_loss = float(metrics["loss"])
            last_metrics = metrics
            step += 1
        if step >= 240:
            break

    last_loss = float(last_metrics["loss"])
    assert np.isfinite(last_loss)
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)
    assert float(last_metrics["mean_pos_iou"]) > 0.7

    eval_step = make_eval_step(cfg, model)
    hits, total = 0.0, 0.0
    for batch in batches.epoch(0):
        jb = {k: jax.numpy.asarray(v) for k, v in batch.items()}
        counts, n_valid, *_ = eval_step(state.params, jb)
        hits += float(counts[(1, 0.5)])
        total += float(n_valid)
    assert total == 16
    assert hits / total >= 0.8, f"R@1 IoU=0.5 = {hits/total:.2f} after overfit"


@pytest.mark.slow
def test_regression_learns_at_flagship_width():
    """Regression gradients must stay alive at production width.

    Regression guard: with a hard exp() parameterization, Adam's sign-like
    steps moved the pre-exp logit by ~lr*fan_in per step at width 512,
    exploding distances within 2 steps; decode clipping then zeroed every
    regression gradient permanently (reg_loss frozen at ~1.08, R@1 stuck
    at 25% on the synthetic overfit). The soft-capped exponent + unclipped
    loss decode keep it learning.
    """
    import jax.numpy as jnp

    cfg = get_config("charades_c3d")  # full hidden width 512
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, feature_dim=1024),
        data=dataclasses.replace(cfg.data, dataset="synthetic",
                                 num_clips=32, batch_size=4),
        train=dataclasses.replace(cfg.train, stage=2,
                                 stage2_iou_only=False),
    )
    from drn_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(cfg.data, cfg.model, num_examples=4)
    batch = next(BatchIterator(ds, 4, shuffle=False).epoch(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 100), jax.random.key(0))
    step = make_train_step(cfg, model, mesh=None)
    history = []
    for _ in range(30):
        state, m = step(state, jb)
        history.append(float(m["mean_pos_iou"]))
    # must keep improving long after the step-2 freeze point
    assert history[-1] > history[2] + 0.1, history[::5]
    assert history[-1] > 0.45, history[-1]


def test_stage2_iou_head_learns_under_fold_at_flagship_width():
    """The mix-fold is live in the stage-2 TRAINING step at production
    shapes (TACoS N=960 ≥ the 512 gate) but the bench A/Bs are eval-only;
    this drives the REAL jitted stage-2 train_step at flagship width
    (hidden 512) on a fold-active grid (N=448 ≥ 256, threshold forced to
    0) and requires the IoU loss to actually fall — the variables-read
    gradient path must train, not just match in a one-shot fwd/bwd
    (tests/test_layers.py pins that). CLAUDE.md: validate training
    changes at PRODUCTION width."""
    import jax.numpy as jnp

    cfg = get_config("charades_c3d")  # full hidden width 512
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, feature_dim=1024,
                                  iou_fold_mix_min_locations=0),
        data=dataclasses.replace(cfg.data, dataset="synthetic",
                                 num_clips=256, batch_size=2),
        train=dataclasses.replace(cfg.train, stage=2,
                                 stage2_iou_only=False),
    )
    from drn_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(cfg.data, cfg.model, num_examples=2)
    batch = next(BatchIterator(ds, 2, shuffle=False).epoch(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 100), jax.random.key(0))
    step = make_train_step(cfg, model, mesh=None)
    history = []
    for _ in range(14):
        state, m = step(state, jb)
        history.append(float(m["iou_loss"]))
    assert np.isfinite(history).all(), history
    # memorizing 2 examples: the stage-2 head must fit its tIoU targets
    assert history[-1] < 0.5 * history[0], history

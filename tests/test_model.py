"""Model forward-pass shape/grad tests on the tiny synthetic config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.models import DRN
from drn_tpu.models.drn import location_metadata
from drn_tpu.models.losses import assign_targets, drn_loss


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("synthetic_tiny")
    model = DRN(cfg.model, base_len=cfg.data.num_clips)
    rng = np.random.default_rng(0)
    b, t, f = 4, cfg.data.num_clips, cfg.model.feature_dim
    l = cfg.data.max_query_len
    feats = jnp.asarray(rng.normal(size=(b, t, f)), jnp.float32)
    words = jnp.asarray(rng.integers(1, cfg.model.vocab_size, (b, l)), jnp.int32)
    lens = np.array([3, 5, 8, 2])[:, None]
    mask = jnp.asarray(np.arange(l)[None, :] < lens, bool)
    params = model.init(jax.random.key(0), feats, words, mask)
    return cfg, model, params, (feats, words, mask)


def test_forward_shapes(setup):
    cfg, model, params, (feats, words, mask) = setup
    out = model.apply(params, feats, words, mask)
    t = cfg.data.num_clips
    n = sum(t // 2 ** lvl for lvl in range(cfg.model.num_levels))
    b = feats.shape[0]
    assert out["d_start"].shape == (b, n)
    assert out["d_end"].shape == (b, n)
    assert out["match_logits"].shape == (b, n)
    assert out["iou_logits"].shape == (b, n)
    assert out["segments"].shape == (b, n, 2)
    # distances positive, segments within grid
    assert bool(jnp.all(out["d_start"] > 0))
    assert bool(jnp.all(out["segments"] >= 0))
    assert bool(jnp.all(out["segments"] <= t))
    for v in out.values():
        assert bool(jnp.all(jnp.isfinite(v)))


def test_assignment_basic(setup):
    cfg, *_ = setup
    t = cfg.data.num_clips
    locs, strides, level_ids = location_metadata(cfg.model, t)
    gt = jnp.array([[4.0, 10.0], [0.0, float(t)], [7.2, 7.4]])
    pos = assign_targets(cfg.model, locs, level_ids, gt, t)
    # query 0: short span → positives exist, all inside span
    assert int(pos[0].sum()) > 0
    inside = (locs > 4.0) & (locs < 10.0)
    assert bool(jnp.all(~pos[0] | inside))
    # query 1: whole-video span → positives land on coarsest level only
    lv = level_ids[None, :]
    assert int(pos[1].sum()) > 0
    assert bool(jnp.all(~pos[1] | (lv[0] == cfg.model.num_levels - 1)))
    # query 2: sub-cell span → fallback assigns exactly one level-0 location
    assert int(pos[2].sum()) == 1
    idx = int(jnp.argmax(pos[2]))
    assert int(level_ids[idx]) == 0
    assert abs(float(locs[idx]) - 7.3) <= 0.5


def test_loss_finite_and_grads_flow(setup):
    cfg, model, params, (feats, words, mask) = setup
    t = cfg.data.num_clips
    locs, _, level_ids = location_metadata(cfg.model, t)
    gt = jnp.array([[4.0, 10.0], [2.0, 30.0], [0.5, 12.0], [8.0, 20.0]])
    tcfg = cfg.train

    def loss_fn(p):
        out = model.apply(p, feats, words, mask)
        return drn_loss(cfg.model, tcfg, out, locs, level_ids, gt, t)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    gnorm = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0
    )
    assert gnorm > 0
    # stage 1: no grad through the IoU head's sampled inputs into loc tower?
    # (IoU loss is off in stage 1; just check the head's own params get grads
    # when stage 2 is on.)
    import dataclasses
    tcfg2 = dataclasses.replace(tcfg, stage=2)

    def loss_fn2(p):
        out = model.apply(p, feats, words, mask)
        return drn_loss(cfg.model, tcfg2, out, locs, level_ids, gt, t)

    (_, _), grads2 = jax.value_and_grad(loss_fn2, has_aux=True)(params)
    iou_g = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        grads2["params"]["iou_head"],
        0.0,
    )
    assert iou_g > 0


def test_fast_lstm_matches_rnn_path(setup):
    """The fused-scan BiLSTM (QueryEncoder.fast) must reproduce the
    per-direction nn.RNN formulation at the user-visible contract — the
    pooled per-level queries — to fp32 tolerance, including ragged
    lengths. (Padded positions may legitimately differ: nn.RNN freezes
    carries past seq_lengths, the fast path lets them run; both are
    masked out of the pool.)"""
    from drn_tpu.models.query_encoder import QueryEncoder

    cfg, model, params, (feats, words, mask) = setup
    qp = {"params": params["params"]["query_encoder"]}
    fast = QueryEncoder(cfg.model, fast=True).apply(qp, words, mask)
    slow = QueryEncoder(cfg.model, fast=False).apply(qp, words, mask)
    assert len(fast) == len(slow) == cfg.model.num_levels
    for f, s in zip(fast, slow):
        np.testing.assert_allclose(np.asarray(f), np.asarray(s),
                                   rtol=1e-5, atol=1e-5)


def test_fast_lstm_single_token_rows(setup):
    """Edge case: rows whose mask is a single live token (the pipeline's
    empty-query fallback) must not NaN or diverge between paths."""
    from drn_tpu.models.query_encoder import QueryEncoder

    cfg, model, params, (feats, words, mask) = setup
    qp = {"params": params["params"]["query_encoder"]}
    m1 = np.zeros_like(np.asarray(mask))
    m1[:, 0] = True
    m1 = jnp.asarray(m1)
    fast = QueryEncoder(cfg.model, fast=True).apply(qp, words, m1)
    slow = QueryEncoder(cfg.model, fast=False).apply(qp, words, m1)
    for f, s in zip(fast, slow):
        assert np.isfinite(np.asarray(f)).all()
        np.testing.assert_allclose(np.asarray(f), np.asarray(s),
                                   rtol=1e-5, atol=1e-5)

"""Optimizer masking rules.

Frozen GloVe embeddings are frozen against BOTH gradient flow
(stop_gradient) and adamw's additive weight-decay term — a bare adamw
would decay the "frozen" table geometrically toward zero while
gradient-based freeze tests stay green.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.train import build_model, init_state, make_optimizer


def _tiny_cfg(weight_decay):
    cfg = get_config("synthetic_tiny")
    return cfg.replace(
        train=dataclasses.replace(cfg.train, weight_decay=weight_decay))


def _embed_table(params):
    return params["params"]["query_encoder"]["embedding"]["embedding"]


@pytest.mark.parametrize("weight_decay", [0.01])
def test_frozen_embeddings_survive_weight_decay(weight_decay):
    cfg = _tiny_cfg(weight_decay)
    emb = np.random.default_rng(0).normal(
        size=(32, cfg.model.embed_dim)).astype(np.float32)
    model = build_model(cfg, pretrained_embeddings=emb)
    state = init_state(cfg, model, make_optimizer(cfg, 10),
                       jax.random.key(0))
    before = np.asarray(_embed_table(state.params))
    np.testing.assert_allclose(before, emb, rtol=1e-6)

    # A full apply_gradients with zero grads isolates the decay term:
    # adamw's update must leave the masked (embedding) leaf untouched
    # while decaying everything else.
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    state2 = state.apply_gradients(grads=zero_grads)
    after = np.asarray(_embed_table(state2.params))
    np.testing.assert_array_equal(after, before)

    # ... and weight decay DOES still act on unmasked NONZERO kernels
    # (zero-initialized leaves don't move under decay — skip them).
    l0 = jax.tree_util.tree_leaves(state.params["params"]["backbone"])
    l1 = jax.tree_util.tree_leaves(state2.params["params"]["backbone"])
    moved = any(
        np.abs(a).max() > 0 and not np.array_equal(np.asarray(a),
                                                   np.asarray(b))
        for a, b in zip(l0, l1)
    )
    assert moved, "weight decay should have moved non-embedding params"


def test_stage2_iou_only_requires_stage2_cli():
    from drn_tpu.train import main

    with pytest.raises(SystemExit):
        main(["--config", "synthetic_tiny", "--stage2-iou-only",
              "--max-steps", "1"])


def test_stage2_defaults_to_iou_only_freeze():
    """Pin the measured stage-2 regime decision (docs/design.md §4.3,
    logs/stage2_regime_ab_r5.log): the config default is the IoU-head
    freeze, and a stage-2 optimizer built from defaults zeroes every
    non-IoU-head update."""
    cfg = get_config("synthetic_tiny")
    assert cfg.train.stage2_iou_only is True
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, stage=2))
    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 10),
                       jax.random.key(0))
    ones = jax.tree_util.tree_map(jnp.ones_like, state.params)
    state2 = state.apply_gradients(grads=ones)
    moved = jax.tree_util.tree_map_with_path(
        lambda path, a, b: (any(getattr(p, "key", None) == "iou_head"
                                for p in path),
                            not np.array_equal(np.asarray(a),
                                               np.asarray(b))),
        state.params, state2.params)
    for is_iou, did_move in jax.tree_util.tree_leaves(
            moved, is_leaf=lambda x: isinstance(x, tuple)):
        assert did_move == is_iou, (is_iou, did_move)


def test_stage2_joint_cli_overrides_freeze_default(tmp_path):
    import json

    from drn_tpu.train import main

    # The two flags are mutually exclusive...
    with pytest.raises(SystemExit):
        main(["--config", "synthetic_tiny", "--stage", "2",
              "--stage2-iou-only", "--stage2-joint", "--max-steps", "1"])

    # ...and --stage2-joint actually overrides the freeze default: the
    # run's persisted provenance must record stage2_iou_only=False (a
    # regression that makes the flag a no-op would silently train the
    # freeze when the user asked for joint fine-tuning).
    ckpt = tmp_path / "ckpt"
    main(["--config", "synthetic_tiny", "--stage", "2", "--stage2-joint",
          "--max-steps", "1", "--checkpoint-dir", str(ckpt)])
    prov = json.loads(
        (ckpt / "synthetic_tiny" / "stage2" /
         "experiment_config.json").read_text())
    assert prov["train"]["stage2_iou_only"] is False

"""End-to-end pipeline tests: two-stage recipe, resume, distributed eval.

Covers the reference workflows SURVEY.md §4.1/§4.2/§4.3 describe: stage-1
training → checkpoint → stage-2 init from stage-1 → eval, plus the
DP-sharded eval path on the virtual 8-device mesh.
"""

import dataclasses
import json

import jax
import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.data.pipeline import BatchIterator, make_dataset
from drn_tpu.evaluate import evaluate, make_eval_step
from drn_tpu.parallel import make_mesh
from drn_tpu.train import build_model, init_state, make_optimizer, train


def _tiny_cfg(tmp_path, **train_kw):
    cfg = get_config("synthetic_tiny")
    tr = dict(checkpoint_dir=str(tmp_path), checkpoint_every_steps=1,
              num_epochs=1, eval_every_epochs=0, log_every_steps=1000)
    tr.update(train_kw)
    return cfg.replace(train=dataclasses.replace(cfg.train, **tr))


@pytest.mark.slow
def test_two_stage_training(tmp_path):
    cfg1 = _tiny_cfg(tmp_path, stage=1)
    state1 = train(cfg1, max_steps=3)
    assert int(state1.step) == 3

    # Stage 2 initializes params from the stage-1 checkpoint.
    cfg2 = _tiny_cfg(tmp_path, stage=2)
    stage1_dir = f"{cfg1.train.checkpoint_dir}/{cfg1.name}/stage1"
    state2 = train(cfg2, init_from=stage1_dir, max_steps=2)
    assert int(state2.step) == 2

    # Stage flag gates the IoU term in the total loss.
    from drn_tpu.models.drn import location_metadata
    from drn_tpu.models.losses import drn_loss

    ds = make_dataset(cfg1.data, cfg1.model)
    batch = next(BatchIterator(ds, cfg1.data.batch_size).epoch(0))
    model = build_model(cfg1)
    jb = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    out = model.apply(state2.params, jb["features"], jb["word_ids"],
                      jb["query_mask"])
    locs, _, level_ids = location_metadata(cfg1.model, cfg1.data.num_clips)
    t1, m1 = drn_loss(cfg1.model, cfg1.train, out, locs, level_ids,
                      jb["gt_grid"], cfg1.data.num_clips, jb["valid"])
    t2, m2 = drn_loss(cfg2.model, cfg2.train, out, locs, level_ids,
                      jb["gt_grid"], cfg2.data.num_clips, jb["valid"])
    np.testing.assert_allclose(
        float(t2 - t1), float(m1["iou_loss"]), rtol=1e-5
    )


@pytest.mark.slow
def test_resume_from_checkpoint(tmp_path):
    cfg = _tiny_cfg(tmp_path, stage=1)
    s1 = train(cfg, max_steps=2)
    # Second call resumes at step 2 and continues to 4.
    s2 = train(cfg, max_steps=4)
    assert int(s1.step) == 2 and int(s2.step) == 4


def test_eval_mesh_equivalence():
    """DP-sharded eval must produce identical recall to single-device."""
    cfg = get_config("synthetic_tiny")
    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 1), jax.random.key(0))
    ds = make_dataset(cfg.data, cfg.model, split="test")
    ds.num_examples = 32
    ds._examples = ds._examples[:32]

    r_single = evaluate(cfg, model, state.params, dataset=ds)
    mesh = make_mesh(model_axis=1)
    r_mesh = evaluate(cfg, model, state.params, dataset=ds, mesh=mesh)
    assert r_single.keys() == r_mesh.keys()
    for k in r_single:
        np.testing.assert_allclose(r_single[k], r_mesh[k], atol=1e-6), k


def test_stage2_iou_only_freezes_grounding(tmp_path):
    """With stage2_iou_only, only iou_head params change in a step."""
    import jax.numpy as jnp

    from drn_tpu.train import make_train_step

    cfg = _tiny_cfg(tmp_path, stage=2, stage2_iou_only=True)
    ds = make_dataset(cfg.data, cfg.model)
    batch = next(BatchIterator(ds, cfg.data.batch_size).epoch(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 8), jax.random.key(0))
    before = jax.device_get(state.params)
    new_state, _ = make_train_step(cfg, model, mesh=None)(state, jb)
    after = jax.device_get(new_state.params)

    changed = {
        top: any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree_util.tree_leaves(before["params"][top]),
                            jax.tree_util.tree_leaves(after["params"][top]))
        )
        for top in before["params"]
    }
    assert changed["iou_head"]
    assert not any(v for k, v in changed.items() if k != "iou_head"), changed


def test_resume_reproduces_continuous_run(tmp_path):
    """2 steps + resume + 2 steps must equal one 4-step run exactly
    (regression: the resume skip previously re-trained from batch 0)."""
    cfg_a = _tiny_cfg(tmp_path / "a", stage=1)
    s_cont = train(cfg_a, max_steps=4)

    cfg_b = _tiny_cfg(tmp_path / "b", stage=1)
    train(cfg_b, max_steps=2)
    s_resumed = train(cfg_b, max_steps=4)

    la = jax.tree_util.tree_leaves(jax.device_get(s_cont.params))
    lb = jax.tree_util.tree_leaves(jax.device_get(s_resumed.params))
    for a, b in zip(la, lb):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_lockstep_epoch_pads_short_shards():
    """lockstep_epoch yields exactly n_steps batches, padding the tail with
    all-invalid rows that keep shapes/dtypes and one live query token."""
    import numpy as np

    from drn_tpu.train import lockstep_epoch

    real = {
        "features": np.ones((4, 8, 16), np.float32),
        "word_ids": np.ones((4, 6), np.int32),
        "query_mask": np.ones((4, 6), bool),
        "gt_grid": np.full((4, 2), 3.0, np.float32),
        "duration": np.full((4,), 12.0, np.float32),
        "valid": np.ones((4,), bool),
    }

    class Short:
        def epoch(self, e, skip_batches=0):
            yield {k: v.copy() for k, v in real.items()}

    got = list(lockstep_epoch(Short(), 0, 0, 3))
    assert len(got) == 3
    assert got[0]["valid"].all()
    for pad in got[1:]:
        assert not pad["valid"].any()
        assert pad["features"].shape == real["features"].shape
        assert (pad["gt_grid"] == np.asarray([0.0, 1.0])).all()
        assert pad["query_mask"][:, 0].all()       # LSTM length >= 1
        assert not pad["query_mask"][:, 1:].any()
        assert pad["features"].dtype == np.float32


def test_lockstep_epoch_empty_shard_raises():
    import pytest as _pytest

    from drn_tpu.train import lockstep_epoch

    class Empty:
        def epoch(self, e, skip_batches=0):
            return iter(())

    with _pytest.raises(AssertionError):
        list(lockstep_epoch(Empty(), 0, 0, 1))


def test_predict_valid_and_gt_grid_independent():
    """predict() fills 'gt_grid' and 'valid' independently — a batch with
    GT but no valid mask must not KeyError (review finding: the guard
    coupled the two keys)."""
    import jax
    import numpy as np

    from drn_tpu.config import get_config
    from drn_tpu.evaluate import predict
    from drn_tpu.train import build_model, init_state, make_optimizer

    cfg = get_config("synthetic_tiny")
    model = build_model(cfg)
    params = init_state(cfg, model, make_optimizer(cfg, 1),
                        jax.random.key(0)).params
    rng = np.random.default_rng(0)
    b, t, f, l = 2, cfg.data.num_clips, cfg.model.feature_dim, \
        cfg.data.max_query_len
    batch = {
        "features": rng.normal(size=(b, t, f)).astype(np.float32),
        "word_ids": rng.integers(2, cfg.model.vocab_size, (b, l))
        .astype(np.int32),
        "query_mask": np.ones((b, l), bool),
        "duration": np.full((b,), 10.0, np.float32),
        "gt_grid": np.asarray([[1.0, 5.0], [2.0, 9.0]], np.float32),
        # note: no "valid"
    }
    segs, keep, scores = predict(cfg, model, params, batch)
    assert segs.shape[0] == b and np.isfinite(segs).all()

    # Minimal inference batch — no labels, no duration: every optional
    # key defaults independently (duration-less => grid-unit segments).
    minimal = {k: batch[k] for k in ("features", "word_ids", "query_mask")}
    segs_g, _, _ = predict(cfg, model, params, minimal)
    assert segs_g.shape[0] == b and np.isfinite(segs_g).all()
    # grid units vs seconds: duration=10 s over a num_clips grid scales
    # segments by 10/num_clips relative to the duration-less call
    np.testing.assert_allclose(
        segs_g * (10.0 / cfg.data.num_clips),
        np.asarray(predict(cfg, model, params,
                           dict(minimal, duration=batch["duration"]))[0]),
        rtol=1e-5, atol=1e-6,
    )


def test_default_eval_fn_refuses_splitless_annotation(tmp_path, capsys):
    """A split-less annotation_path would evaluate the TRAIN file as
    'val'/'test' — _default_eval_fn must skip in-training eval instead."""
    import dataclasses

    from drn_tpu.config import get_config
    from drn_tpu.train import _default_eval_fn, build_model

    ann = tmp_path / "charades_sta_train.txt"
    ann.write_text("VID00 0.0 2.0##a person\n", encoding="utf-8")
    cfg = get_config("synthetic_tiny")
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, dataset="charades", annotation_path=str(ann)))
    fn = _default_eval_fn(cfg, build_model(cfg), mesh=None)
    assert fn is None
    assert "skipping in-training eval" in capsys.readouterr().out


def test_score_iou_weight_blend():
    """EvalConfig.score_iou_weight (VERDICT r4 item 2): w=0 is bit-identical
    to rescoring OFF, w=1 is the full product (the prior boolean behavior),
    and fractional w applies sigmoid(match)·sigmoid(iou)^w exactly — checked
    against a direct recomputation from raw model outputs AND the NumPy
    reference oracle."""
    import jax.numpy as jnp

    cfg = get_config("synthetic_tiny")
    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 1), jax.random.key(0))
    ds = make_dataset(cfg.data, cfg.model, split="test")
    batch = next(BatchIterator(ds, cfg.data.batch_size,
                               shuffle=False).epoch(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    def run(use, w):
        c = cfg.replace(eval=dataclasses.replace(
            cfg.eval, score_use_iou_head=use, score_iou_weight=w))
        return jax.device_get(make_eval_step(c, model)(state.params, jb))

    _, _, segs_off, keep_off, scores_off = run(False, 1.0)
    _, _, segs_w0, keep_w0, scores_w0 = run(True, 0.0)
    np.testing.assert_array_equal(scores_off, scores_w0)   # w=0 ≡ off
    np.testing.assert_array_equal(segs_off, segs_w0)
    np.testing.assert_array_equal(keep_off, keep_w0)

    _, _, _, _, scores_w1 = run(True, 1.0)
    assert not np.allclose(scores_off, scores_w1)  # head does reweight

    # Fractional w: top-k of m·i^w recomputed from raw outputs.
    out = model.apply(state.params, jb["features"], jb["word_ids"],
                      jb["query_mask"])
    m = np.asarray(jax.nn.sigmoid(out["match_logits"]), np.float64)
    i = np.asarray(jax.nn.sigmoid(out["iou_logits"]), np.float64)
    _, _, _, _, scores_half = run(True, 0.5)
    expected = np.sort(m * i ** 0.5, axis=1)[:, ::-1][:, :cfg.eval.top_k]
    np.testing.assert_allclose(scores_half, expected, atol=1e-5)

    # Oracle agreement at fractional w (same counts as the jitted step).
    from drn_tpu.ops.metrics import MIOU_KEY
    from drn_tpu.parity.oracle import reference_postprocess

    counts_half = run(True, 0.5)[0]
    oracle = reference_postprocess(
        {k: np.asarray(out[k])
         for k in ("segments", "match_logits", "iou_logits")},
        gt=batch["gt_grid"], valid=batch["valid"],
        top_k=cfg.eval.top_k,
        nms_iou_threshold=cfg.eval.nms_iou_threshold,
        score_use_iou_head=True, score_iou_weight=0.5,
        ns=cfg.eval.recall_ns, iou_thresholds=cfg.eval.iou_thresholds,
    )
    for k, v in oracle["counts"].items():
        if k == MIOU_KEY:
            np.testing.assert_allclose(float(counts_half[k]), v, atol=1e-3)
        else:
            assert float(counts_half[k]) == v, (k, float(counts_half[k]), v)


def test_rescore_blend_operating_point():
    """Pin the measured blend default (design.md §4.4, VERDICT r4 item 2):
    w=0.25 in every registry config, and the DIRECTION of the knob — a
    softer exponent reranks less aggressively than w=1 (top-5 sets stay
    closer to the match-only ranking, which is what recovers R@5) while
    still reranking (which is what keeps the R@1 gain)."""
    from drn_tpu.config import _REGISTRY

    for name, c in _REGISTRY.items():
        assert c.eval.score_iou_weight == 0.25, name

    cfg = get_config("synthetic_tiny")
    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 1), jax.random.key(0))
    ds = make_dataset(cfg.data, cfg.model, split="test")
    batch = next(BatchIterator(ds, cfg.data.batch_size,
                               shuffle=False).epoch(0))
    out = model.apply(state.params, batch["features"], batch["word_ids"],
                      batch["query_mask"])
    m = np.asarray(jax.nn.sigmoid(out["match_logits"]), np.float64)
    i = np.asarray(jax.nn.sigmoid(out["iou_logits"]), np.float64)

    def top5(scores):
        return np.argsort(-scores, axis=1)[:, :5]

    base = top5(m)
    overlap = {w: np.mean([len(set(a) & set(b))
                           for a, b in zip(top5(m * i ** w), base)])
               for w in (0.25, 1.0)}
    assert overlap[0.25] >= overlap[1.0], overlap   # softer rerank
    # ... but the default still reranks (top-1 changes somewhere).
    assert (top5(m * i ** 0.25)[:, 0] != base[:, 0]).any()


def test_default_eval_fn_warns_on_corrupt_val(tmp_path, capsys):
    """A PRESENT but unreadable val annotation file must warn loudly, not
    silently disable in-training eval (VERDICT r4 item 6) — and a readable
    test split must still be picked up after the corrupt val."""
    from drn_tpu.train import _default_eval_fn

    ann = tmp_path / "anet_{split}.json"
    (tmp_path / "anet_val.json").write_text("{ this is not json",
                                            encoding="utf-8")
    cfg = get_config("synthetic_tiny")
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, dataset="activitynet", annotation_path=str(ann)))

    # Only the corrupt val exists → warn + disabled (None).
    fn = _default_eval_fn(cfg, build_model(cfg), mesh=None)
    out = capsys.readouterr().out
    assert fn is None
    assert "unreadable" in out and "'val'" in out

    # A valid test split after the corrupt val → warn but still eval.
    (tmp_path / "anet_test.json").write_text(json.dumps({
        "v_ok": {"duration": 10.0, "timestamps": [[1.0, 4.0]],
                 "sentences": ["a person walks"]},
    }), encoding="utf-8")
    fn = _default_eval_fn(cfg, build_model(cfg), mesh=None)
    out = capsys.readouterr().out
    assert fn is not None
    assert "unreadable" in out


def test_gradient_accumulation_matches_single_step():
    """accum_steps=2 over two IDENTICAL micro-batches applies exactly the
    single-batch update (average of equal grads == the grad), and holds
    params frozen until the accumulation boundary."""
    import dataclasses

    import jax
    import numpy as np

    from drn_tpu.config import get_config
    from drn_tpu.data.pipeline import BatchIterator
    from drn_tpu.data.synthetic import SyntheticDataset
    from drn_tpu.train import (build_model, init_state, make_optimizer,
                               make_train_step)

    cfg = get_config("synthetic_tiny")
    ds = SyntheticDataset(cfg.data, cfg.model, num_examples=8)
    batch = next(BatchIterator(ds, 8, shuffle=False).epoch(0))
    jb = {k: np.asarray(v) for k, v in batch.items()}
    model = build_model(cfg)

    def leaves(p):
        return jax.tree_util.tree_leaves(p)

    # 1-step reference
    s_ref = init_state(cfg, model, make_optimizer(cfg, 4),
                       jax.random.key(0))
    step_ref = make_train_step(cfg, model, mesh=None)
    s_ref, _ = step_ref(s_ref, {k: v.copy() for k, v in jb.items()})

    # 2 accumulated micro-steps on the same batch
    cfg2 = cfg.replace(train=dataclasses.replace(cfg.train, accum_steps=2))
    s_acc = init_state(cfg2, model, make_optimizer(cfg2, 4),
                       jax.random.key(0))
    p0 = jax.device_get(s_acc.params)
    step_acc = make_train_step(cfg2, model, mesh=None)
    s_acc, _ = step_acc(s_acc, {k: v.copy() for k, v in jb.items()})
    # mid-accumulation: params unchanged
    for a, b in zip(leaves(p0), leaves(jax.device_get(s_acc.params))):
        np.testing.assert_array_equal(a, b)
    s_acc, _ = step_acc(s_acc, {k: v.copy() for k, v in jb.items()})
    for a, b in zip(leaves(jax.device_get(s_ref.params)),
                    leaves(jax.device_get(s_acc.params))):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_lr_decay_epoch_honored_under_accumulation():
    """optax schedules count OPTIMIZER updates; with accum_steps=k each
    epoch produces steps_per_epoch/k of them, so the decay boundary must
    be scaled — otherwise decay lands k epochs late (ADVICE r2). Adam's
    update magnitude ~= lr for a constant gradient, which makes the decay
    point directly observable."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from drn_tpu.config import get_config
    from drn_tpu.train import make_optimizer

    spe = 4  # micro-steps per epoch
    cfg = get_config("synthetic_tiny")
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, accum_steps=2, learning_rate=1e-3,
        lr_decay_epochs=(1,), lr_decay_rate=0.1,
    ))
    tx = make_optimizer(cfg, steps_per_epoch=spe)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}
    opt_state = tx.init(params)
    deltas = []
    for _ in range(2 * spe):  # 2 epochs of micro-steps = 4 optimizer updates
        updates, opt_state = tx.update(grads, opt_state, params)
        step = float(np.abs(np.asarray(updates["w"])).max())
        if step > 0:  # MultiSteps emits zero updates on accumulation steps
            deltas.append(step)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert len(deltas) == 4
    # epoch 1 (updates 1-2) at full lr; epoch 2 (updates 3-4) decayed 10x
    np.testing.assert_allclose(deltas[0], 1e-3, rtol=0.2)
    np.testing.assert_allclose(deltas[1], 1e-3, rtol=0.2)
    np.testing.assert_allclose(deltas[2], 1e-4, rtol=0.2)
    np.testing.assert_allclose(deltas[3], 1e-4, rtol=0.2)


def test_lr_decay_epochs_colliding_on_one_update_compound():
    """With accum_steps >= steps_per_epoch, two decay epochs can truncate
    to the SAME optimizer-update index; both decays must still apply
    (compounded) rather than one being silently dropped by dict
    construction. Here updates_per_epoch = 4/8 = 0.5, so epochs 20 and 21
    both map to update boundary 10 -> combined 0.01x from update 11 on."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from drn_tpu.config import get_config
    from drn_tpu.train import make_optimizer

    spe = 4
    cfg = get_config("synthetic_tiny")
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, accum_steps=8, learning_rate=1e-3,
        lr_decay_epochs=(20, 21), lr_decay_rate=0.1,
    ))
    tx = make_optimizer(cfg, steps_per_epoch=spe)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}
    opt_state = tx.init(params)
    deltas = []
    for _ in range(11 * 8):  # 11 optimizer updates x 8 micro-steps each
        updates, opt_state = tx.update(grads, opt_state, params)
        step = float(np.abs(np.asarray(updates["w"])).max())
        if step > 0:
            deltas.append(step)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert len(deltas) == 11
    np.testing.assert_allclose(deltas[9], 1e-3, rtol=0.2)   # update 10
    np.testing.assert_allclose(deltas[10], 1e-5, rtol=0.2)  # both decays

"""Device-resident feature staging (drn_tpu/data/staging.py).

The staged path must be a pure performance choice: identical rows,
identical eval metrics, identical train metrics — only where the
features come from (HBM table gather vs per-example host reads) differs.
"""

import dataclasses

import jax
import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.data.pipeline import BatchIterator, make_dataset
from drn_tpu.data.staging import stage_video_features


def _disk_corpus(tmp_path, cfg, n_videos=3, queries_per_video=2):
    rng = np.random.default_rng(11)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    lines = []
    for v in range(n_videos):
        rows = 20 + 4 * v
        np.save(feat_dir / f"V{v}.npy",
                rng.normal(size=(rows, cfg.model.feature_dim))
                .astype(np.float32))
        for q in range(queries_per_video):
            s, e = 1.0 + q, 6.0 + q
            lines.append(f"V{v} {s} {e}##person does thing {q} in {v}\n")
    ann = tmp_path / "charades_sta_{split}.txt"
    for split in ("train", "test"):
        (tmp_path / f"charades_sta_{split}.txt").write_text("".join(lines))
    return dataclasses.replace(
        cfg.data, dataset="charades", feature_dir=str(feat_dir),
        annotation_path=str(ann), feature_fps=1.0, batch_size=4)


@pytest.fixture()
def corpus_cfg(tmp_path):
    cfg = get_config("synthetic_tiny")
    return cfg.replace(data=_disk_corpus(tmp_path, cfg))


def test_staged_view_matches_dataset_rows(corpus_cfg):
    cfg = corpus_cfg
    ds = make_dataset(cfg.data, cfg.model, split="train")
    table, view = stage_video_features(ds)
    assert len(view) == len(ds) == 6
    assert table.shape == (3, cfg.data.num_clips, cfg.model.feature_dim)
    for i in range(len(ds)):
        full = ds[i]
        light = view[i]
        np.testing.assert_array_equal(
            table[int(light["video_row"])], full["features"])
        for k in ("word_ids", "query_mask", "gt_grid", "duration", "valid"):
            np.testing.assert_array_equal(light[k], full[k])
        assert "features" not in light


def test_staged_eval_metrics_identical(corpus_cfg):
    from drn_tpu.evaluate import evaluate
    from drn_tpu.train import build_model, init_params

    cfg = corpus_cfg
    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))
    streaming = evaluate(cfg, model, params, split="test")
    staged = evaluate(cfg, model, params, split="test",
                      device_features=True)
    assert streaming == staged


def test_staged_train_step_metrics_identical(corpus_cfg):
    """One step from one init, same batch content through both feature
    paths → identical metrics (the gather is the only difference)."""
    from drn_tpu.train import (build_model, init_state, make_optimizer,
                               make_train_step)

    cfg = corpus_cfg
    ds = make_dataset(cfg.data, cfg.model, split="train")
    table, view = stage_video_features(ds)
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=2)
    step = make_train_step(cfg, model, mesh=None)

    full_b = next(BatchIterator(ds, 4, shuffle=False).epoch(0))
    light_b = next(BatchIterator(view, 4, shuffle=False).epoch(0))
    np.testing.assert_array_equal(
        table[light_b["video_row"]][light_b["valid"]],
        full_b["features"][full_b["valid"]])

    s1 = init_state(cfg, model, tx, jax.random.key(1))
    s2 = init_state(cfg, model, tx, jax.random.key(1))
    _, m_full = step(s1, {k: v for k, v in full_b.items()})
    _, m_staged = step(s2, {k: v for k, v in light_b.items()},
                       np.asarray(table))
    for k in m_full:
        np.testing.assert_allclose(
            np.asarray(m_full[k]), np.asarray(m_staged[k]), rtol=1e-6,
            err_msg=k)


def test_staged_eval_on_mesh_matches_single_device(corpus_cfg):
    """Staged eval under a DP mesh (replicated table, sharded indices)
    equals the unsharded staged eval."""
    from drn_tpu.evaluate import evaluate
    from drn_tpu.parallel import make_mesh
    from drn_tpu.train import build_model, init_params

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    cfg = corpus_cfg
    # batch divisible by the 8-device data axis
    cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, batch_size=8))
    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))
    single = evaluate(cfg, model, params, split="test",
                      device_features=True)
    meshed = evaluate(cfg, model, params, split="test", mesh=make_mesh(),
                      device_features=True)
    assert single == meshed


def test_train_device_features_end_to_end(corpus_cfg, tmp_path):
    """A staged training run executes on the on-disk corpus; the synthetic
    fixture (no feature files to stage) is rejected loudly, including
    through the CLI flag."""
    from drn_tpu.train import main, train

    cfg = corpus_cfg.replace(train=dataclasses.replace(
        corpus_cfg.train, checkpoint_dir=str(tmp_path / "ckpt")))
    state = train(cfg, max_steps=2, device_features=True)
    assert int(state.step) == 2

    with pytest.raises(ValueError, match="synthetic"):
        main(["--config", "synthetic_tiny", "--max-steps", "1",
              "--device-features",
              "--checkpoint-dir", str(tmp_path / "ckpt2")])


def test_eval_device_features_rejects_synthetic():
    """evaluate(device_features=True) on the synthetic fixture must be
    the same clean ValueError train raises — not an AttributeError from
    stage_video_features poking a dataset with no feature files."""
    from drn_tpu.evaluate import evaluate

    cfg = get_config("synthetic_tiny")
    with pytest.raises(ValueError, match="synthetic"):
        evaluate(cfg, None, None, device_features=True)

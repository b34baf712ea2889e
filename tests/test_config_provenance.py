"""Config provenance in checkpoints (SURVEY.md §6 Config row; VERDICT r3
item 3): the trainer serializes the full ExperimentConfig next to the
Orbax steps, and every restore path fails loudly when parity-relevant
fields (architecture, level_ranges, grids, vocab mode) differ from the
config that trained the checkpoint — silently-wrong decodes otherwise.
"""

import dataclasses
import json
import os

import pytest

from drn_tpu.config import get_config
from drn_tpu.utils.checkpoint import (CONFIG_FILENAME, check_experiment_config,
                                      config_parity_diffs,
                                      load_experiment_config,
                                      save_experiment_config)


def _mutated(cfg, **model_kw):
    return cfg.replace(model=dataclasses.replace(cfg.model, **model_kw))


def test_save_load_roundtrip(tmp_path):
    cfg = get_config("synthetic_tiny")
    save_experiment_config(str(tmp_path), cfg)
    saved = load_experiment_config(str(tmp_path))
    assert saved["name"] == "synthetic_tiny"
    assert saved["model"]["hidden_dim"] == cfg.model.hidden_dim
    # identical config → no parity diffs (incl. tuple/list JSON round-trip)
    assert config_parity_diffs(saved, cfg) == []
    # best/ subdir inherits the parent's provenance file
    (tmp_path / "best").mkdir()
    assert load_experiment_config(str(tmp_path / "best")) == saved


def test_parity_diffs_detect_semantic_drift(tmp_path):
    cfg = get_config("synthetic_tiny")
    save_experiment_config(str(tmp_path), cfg)
    saved = load_experiment_config(str(tmp_path))

    # Architecture drift: level_ranges (the VERDICT example).
    drifted = _mutated(cfg, level_ranges=((0.0, 0.5), (0.5, 2.0)))
    diffs = config_parity_diffs(saved, drifted)
    assert any("level_ranges" in d for d in diffs), diffs

    # Grid drift.
    d2 = cfg.replace(data=dataclasses.replace(cfg.data, num_clips=64))
    assert any("num_clips" in d for d in config_parity_diffs(saved, d2))

    # Vocab MODE drift (glove vs hashed), not path-string drift.
    d3 = cfg.replace(data=dataclasses.replace(cfg.data,
                                              glove_path="/x/glove.txt"))
    assert any("glove_path mode" in d for d in config_parity_diffs(saved, d3))

    # Training-only knobs are NOT parity-relevant.
    d4 = cfg.replace(train=dataclasses.replace(cfg.train, learning_rate=9.9,
                                               stage=2))
    assert config_parity_diffs(saved, d4) == []

    # Scheduling-only model knobs pick between numerics-equivalent
    # compute paths (design.md §3/§4.2): re-tuning them must not lock
    # users out of existing checkpoints.
    d5 = _mutated(cfg, use_pallas_fusion=True,
                  iou_fold_mix_min_locations=0)
    assert config_parity_diffs(saved, d5) == []


def test_check_raises_warns_and_passes(tmp_path):
    cfg = get_config("synthetic_tiny")
    d = str(tmp_path)
    # pre-provenance checkpoint dir (no file): silent pass
    assert check_experiment_config(d, cfg) == []

    save_experiment_config(d, cfg)
    assert check_experiment_config(d, cfg) == []

    drifted = _mutated(cfg, hidden_dim=128)
    with pytest.raises(ValueError, match="hidden_dim"):
        check_experiment_config(d, cfg=drifted)
    with pytest.warns(UserWarning, match="hidden_dim"):
        diffs = check_experiment_config(d, drifted, allow_mismatch=True)
    assert diffs

    # corrupted provenance file: warn + behave as pre-provenance
    with open(os.path.join(d, CONFIG_FILENAME), "w") as f:
        f.write("{not json")
    with pytest.warns(UserWarning, match="unreadable"):
        assert check_experiment_config(d, drifted) == []


def test_additive_config_field_warns_not_fails(tmp_path):
    """Schema evolution (ADVICE r4): a parity-relevant field ADDED after a
    checkpoint was saved (saved=absent, active=default) must warn, not
    hard-fail — otherwise every upgrade bricks every old checkpoint."""
    cfg = get_config("synthetic_tiny")
    save_experiment_config(str(tmp_path), cfg)
    saved = load_experiment_config(str(tmp_path))

    # Simulate a pre-upgrade checkpoint: drop a model field + a pinned
    # data field from the saved dict.
    del saved["model"]["hidden_dim"]
    del saved["data"]["num_clips"]
    with pytest.warns(UserWarning, match="schema"):
        assert config_parity_diffs(saved, cfg) == []
    # check_experiment_config passes (warning only, no ValueError)
    with open(os.path.join(str(tmp_path), CONFIG_FILENAME), "w") as f:
        json.dump(saved, f)
    with pytest.warns(UserWarning, match="hidden_dim"):
        assert check_experiment_config(str(tmp_path), cfg) == []

    # A REAL value mismatch still hard-fails even alongside skewed keys.
    drifted = _mutated(
        cfg, head_tower_layers=cfg.model.head_tower_layers + 1)
    with pytest.warns(UserWarning, match="schema"):
        with pytest.raises(ValueError, match="head_tower_layers"):
            check_experiment_config(str(tmp_path), drifted)


@pytest.mark.slow
def test_fresh_run_into_foreign_checkpoint_dir_warns(tmp_path, capsys):
    """A fresh (resume=False) run into a dir holding another config's
    provenance re-attributes the old steps — train() must warn before
    overwriting experiment_config.json (ADVICE r4)."""
    from drn_tpu.train import train

    cfg = get_config("synthetic_tiny")
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, checkpoint_dir=str(tmp_path), eval_every_epochs=0,
        resume=False))
    train(cfg, max_steps=1)
    capsys.readouterr()

    # Same name + dir, parity-different config, fresh run.
    drifted = _mutated(cfg, hidden_dim=cfg.model.hidden_dim * 2)
    train(drifted, max_steps=1)
    out = capsys.readouterr().out
    assert "parity-DIFFERENT" in out
    # ... and the provenance now records the new config (overwrite kept).
    ckpt_dir = f"{tmp_path}/{cfg.name}/stage{cfg.train.stage}"
    saved = json.load(open(os.path.join(ckpt_dir, CONFIG_FILENAME)))
    assert saved["model"]["hidden_dim"] == drifted.model.hidden_dim


@pytest.mark.slow
def test_train_writes_provenance_and_resume_guards(tmp_path):
    """End-to-end: train() writes experiment_config.json; resuming (or
    stage-2 --init-from) under a mutated parity-relevant config raises."""
    from drn_tpu.train import train

    cfg = get_config("synthetic_tiny")
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, checkpoint_dir=str(tmp_path),
                                  eval_every_epochs=0),
    )
    train(cfg, max_steps=2)
    ckpt_dir = f"{tmp_path}/{cfg.name}/stage{cfg.train.stage}"
    path = os.path.join(ckpt_dir, CONFIG_FILENAME)
    assert os.path.exists(path)
    assert json.load(open(path))["model"]["hidden_dim"] == cfg.model.hidden_dim

    # Resume under a changed architecture: loud failure.
    drifted = _mutated(cfg, level_ranges=((0.0, 0.5), (0.5, 2.0)))
    with pytest.raises(ValueError, match="level_ranges"):
        train(drifted, max_steps=2)

    # Stage-2 --init-from under a drifted config: same guard.
    stage2 = drifted.replace(
        train=dataclasses.replace(drifted.train, stage=2, resume=False),
    )
    with pytest.raises(ValueError, match="level_ranges"):
        train(stage2, init_from=ckpt_dir, max_steps=1)

    # Explicit override downgrades to a warning (and then re-records the
    # config actually in effect). The params tree is shape-compatible
    # (level_ranges changes assignment, not shapes), so the restore
    # itself succeeds. Run LAST: the re-record makes `drifted` the new
    # provenance.
    with pytest.warns(UserWarning, match="level_ranges"):
        train(drifted, max_steps=2, allow_config_mismatch=True)
    assert (json.load(open(path))["model"]["level_ranges"]
            == [[0.0, 0.5], [0.5, 2.0]])

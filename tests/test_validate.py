"""Dataset preflight validator (`python -m drn_tpu.data.validate`).

Real data has never been present in this sandbox (SURVEY.md §0); these
tests build miniature on-disk datasets in the documented release formats
and assert the validator catches each corruption class it exists for —
missing features, wrong feature dim, NaNs, truncated queries, and a
mis-configured feature_fps — before a training run would burn TPU time
discovering them.
"""

import dataclasses
import json

import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.data.validate import main as validate_main
from drn_tpu.data.validate import validate


def _charades_fixture(tmp_path, *, fdim=32, rows=30, missing=False,
                      bad_dim=False, nan=False, long_query=False,
                      fps_overrun=False):
    ann = tmp_path / "charades_sta_{split}.txt"
    feats = tmp_path / "feats"
    feats.mkdir(exist_ok=True)
    end = "45.0" if fps_overrun else "9.0"
    q2 = ("word " * 40).strip() if long_query else "person opens a door"
    for split in ("train", "test"):
        (tmp_path / f"charades_sta_{split}.txt").write_text(
            f"VID001 2.0 {end}##a person reads a book.\n"
            f"VID002 0.0 5.5##{q2}\n",
            encoding="utf-8",
        )
    rng = np.random.default_rng(0)
    a = rng.normal(size=(rows, fdim)).astype(np.float32)
    if nan:
        a[3, 4] = np.nan
    np.save(feats / "VID001.npy", a)
    if not missing:
        b = rng.normal(
            size=(rows, fdim // 2 if bad_dim else fdim)).astype(np.float32)
        np.save(feats / "VID002.npy", b)
    return str(ann), str(feats)


def _cfg(tmp_path, fdim=32, **data_overrides):
    ann, feats = tmp_path
    cfg = get_config("charades_c3d")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, feature_dim=fdim),
        data=dataclasses.replace(cfg.data, annotation_path=ann,
                                 feature_dir=feats, **data_overrides),
    )
    return cfg


def test_clean_dataset_passes(tmp_path):
    cfg = _cfg(_charades_fixture(tmp_path), feature_fps=1.0)
    report = validate(cfg)
    assert report["ok"], report
    tr = report["splits"][0]
    assert tr["split"] == "train"
    assert tr["stats"]["examples"] == 2
    assert tr["stats"]["videos"] == 2
    assert tr["stats"]["feature_dim"] == 32
    assert tr["stats"]["videos_missing_features"] == 0
    assert not tr["errors"]


def test_missing_features_is_hard_error(tmp_path):
    cfg = _cfg(_charades_fixture(tmp_path, missing=True), feature_fps=1.0)
    report = validate(cfg)
    assert not report["ok"]
    assert any("have no features" in e
               for e in report["splits"][0]["errors"])
    assert report["splits"][0]["stats"]["videos_missing_features"] == 1


def test_feature_dim_mismatch_is_hard_error(tmp_path):
    # on-disk dim 32 vs config dim 64
    cfg = _cfg(_charades_fixture(tmp_path), fdim=64, feature_fps=1.0)
    report = validate(cfg)
    assert not report["ok"]
    assert any("feature_dim" in e for e in report["splits"][0]["errors"])


def test_inconsistent_dims_flagged(tmp_path):
    cfg = _cfg(_charades_fixture(tmp_path, bad_dim=True), feature_fps=1.0)
    report = validate(cfg)
    assert not report["ok"]
    assert any("inconsistent" in e for e in report["splits"][0]["errors"])


def test_nan_features_is_hard_error(tmp_path):
    cfg = _cfg(_charades_fixture(tmp_path, nan=True), feature_fps=1.0)
    report = validate(cfg)
    assert not report["ok"]
    assert any("NaN" in e for e in report["splits"][0]["errors"])


def test_truncated_queries_warn_not_error(tmp_path):
    cfg = _cfg(_charades_fixture(tmp_path, long_query=True),
               feature_fps=1.0)
    report = validate(cfg)
    assert report["ok"]  # warning, not error
    tr = report["splits"][0]
    assert tr["stats"]["queries_truncated"] == 1
    assert any("truncated" in w for w in tr["warnings"])


def test_fps_overrun_warns(tmp_path):
    """Spans ending at 45 s with 30 feature rows at 1 row/s derive a 30 s
    duration — the signature of a wrong extraction rate."""
    cfg = _cfg(_charades_fixture(tmp_path, fps_overrun=True),
               feature_fps=1.0)
    report = validate(cfg)
    assert report["ok"]
    tr = report["splits"][0]
    assert tr["stats"]["spans_past_derived_duration"] == 1
    assert any("extraction rate" in w for w in tr["warnings"])


def test_unreadable_annotations_reported(tmp_path):
    cfg = _cfg((str(tmp_path / "nope_{split}.txt"), str(tmp_path)))
    report = validate(cfg)
    assert not report["ok"]
    assert any("unreadable" in e for e in report["splits"][0]["errors"])


def test_activitynet_span_sanity(tmp_path):
    ann = tmp_path / "anet.json"
    ann.write_text(json.dumps({
        "v_A": {"duration": 60.0, "timestamps": [[5.0, 70.0], [8.0, 3.0]],
                "sentences": ["ends past duration", "inverted"]},
    }), encoding="utf-8")
    feats = tmp_path / "feats"
    feats.mkdir()
    np.save(feats / "v_A.npy",
            np.zeros((40, 16), np.float32))
    cfg = get_config("activitynet_c3d")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, feature_dim=16),
        data=dataclasses.replace(cfg.data, annotation_path=str(ann),
                                 feature_dir=str(feats)),
    )
    report = validate(cfg, splits=("train",))
    assert report["ok"]
    st = report["splits"][0]["stats"]
    assert st["spans_past_annotated_duration"] == 1
    assert st["spans_nonpositive_length"] == 1


def test_splitless_annotation_validated_once(tmp_path):
    """A {split}-less path resolves every split to the same file —
    validate must collapse to one pass instead of duplicating it."""
    ann = tmp_path / "anet.json"
    ann.write_text(json.dumps({
        "v_A": {"duration": 60.0, "timestamps": [[5.0, 9.0]],
                "sentences": ["a sentence"]},
    }), encoding="utf-8")
    feats = tmp_path / "feats"
    feats.mkdir()
    np.save(feats / "v_A.npy", np.zeros((40, 16), np.float32))
    cfg = get_config("activitynet_c3d")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, feature_dim=16),
        data=dataclasses.replace(cfg.data, annotation_path=str(ann),
                                 feature_dir=str(feats)),
    )
    report = validate(cfg)  # default splits=("train", "test")
    assert report["ok"]
    assert len(report["splits"]) == 1
    assert any("placeholder" in w for w in report["splits"][0]["warnings"])


def test_missing_h5_archive_is_archive_error(tmp_path):
    """A nonexistent .h5 archive must fail as ONE archive-level error,
    not as N bogus per-video 'missing features' misses."""
    cfg = _cfg((_charades_fixture(tmp_path)[0], str(tmp_path / "nope.h5")),
               feature_fps=1.0)
    report = validate(cfg, splits=("train",))
    assert not report["ok"]
    errs = report["splits"][0]["errors"]
    assert any("archive" in e and "does not exist" in e for e in errs)
    assert "videos_missing_features" not in report["splits"][0]["stats"]


def test_cli_exit_codes_and_json(tmp_path, capsys):
    fix = _charades_fixture(tmp_path)
    rc = validate_main(["--config", "charades_c3d",
                        "--annotation-path", fix[0],
                        "--feature-dir", fix[1],
                        "--feature-fps", "1.0"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)
    # config feature_dim is 4096 but fixture is 32 → hard error, rc 1
    assert rc == 1 and not parsed["ok"]
    assert any("feature_dim" in e
               for e in parsed["splits"][0]["errors"])

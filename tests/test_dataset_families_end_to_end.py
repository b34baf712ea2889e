"""On-disk end-to-end CLI runs for the ActivityNet and TACoS families.

`tests/test_cli_end_to_end.py` drives train→evaluate over a real
Charades-STA-format directory of .npy features; these do the same for the
other two dataset families AND the HDF5 feature path, which until round 4
had only parser-level (tests/test_golden_formats.py) and archive-missing
(tests/test_validate.py) coverage — the .h5 happy path never executed.

Layouts match the public releases (SURVEY.md §3 "Datasets"):
- ActivityNet: one archive, features nested one level down per video
  (f["v_..."]["c3d_features"]), annotations {vid: {duration, timestamps
  (seconds), sentences}}.
- TACoS: annotations keyed by "<vid>.avi" with frame-unit timestamps +
  fps/num_frames; features keyed by the bare vid. Flat archive layout
  (one dataset per video id) to cover the non-nested branch.
"""

import dataclasses
import json
import re

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")


def _run_train_eval(config_name, patched, ann_path, feat, ckpt_dir, capsys):
    from drn_tpu import config as config_mod, evaluate, train

    config_mod._REGISTRY[config_name] = patched
    try:
        train.main([
            "--config", config_name,
            "--annotation-path", ann_path,
            "--feature-dir", feat,
            "--checkpoint-dir", str(ckpt_dir),
            "--epochs", "1", "--max-steps", "2", "--batch-size", "8",
            "--lr", "1e-3",
        ])
        evaluate.main([
            "--config", config_name,
            "--annotation-path", ann_path,
            "--feature-dir", feat,
            "--checkpoint-dir", str(ckpt_dir / f"{config_name}/stage1"),
            "--split", "test",
        ])
    finally:
        config_mod._REGISTRY.pop(config_name, None)
    out = capsys.readouterr().out
    pairs = re.findall(r"R@(\d),IoU=([\d.]+): ([\d.]+)", out)
    assert len(pairs) == 6
    for _, _, pct in pairs:
        assert 0.0 <= float(pct) <= 100.0


def _patched_tiny(name, dataset):
    from drn_tpu import config as config_mod

    tiny = config_mod.get_config("synthetic_tiny")
    return tiny.replace(
        name=name,
        model=dataclasses.replace(tiny.model, feature_dim=32),
        data=dataclasses.replace(
            tiny.data, dataset=dataset, feature_type="c3d", num_clips=32,
        ),
    )


@pytest.mark.slow
def test_activitynet_nested_h5_train_then_evaluate(tmp_path, capsys):
    rng = np.random.default_rng(0)
    h5_path = tmp_path / "sub_activitynet_c3d_test_fixture.hdf5"
    ann = {}
    with h5py.File(h5_path, "w") as f:
        for v in range(6):
            vid = f"v_test{v:03d}"
            rows = int(rng.integers(40, 90))
            # the public-release nesting: group per video, dataset inside
            f.create_group(vid).create_dataset(
                "c3d_features",
                data=rng.normal(size=(rows, 32)).astype(np.float32))
            dur = rows / 2.0
            ts, sents = [], []
            for q in range(2):
                s = float(rng.uniform(0, dur * 0.6))
                e = float(rng.uniform(s + 1.0, dur))
                ts.append([s, e])
                sents.append(f"someone performs action {v} {q}.")
            ann[vid] = {"duration": dur, "timestamps": ts,
                        "sentences": sents}
    for split in ("train", "test"):
        (tmp_path / f"anet_{split}.json").write_text(
            json.dumps(ann), encoding="utf-8")

    _run_train_eval(
        "anet_h5_cli_test", _patched_tiny("anet_h5_cli_test", "activitynet"),
        str(tmp_path / "anet_{split}.json"), str(h5_path),
        tmp_path / "ckpt", capsys)


@pytest.mark.slow
def test_tacos_flat_h5_train_then_evaluate(tmp_path, capsys):
    rng = np.random.default_rng(1)
    h5_path = tmp_path / "tacos_c3d_test_fixture.h5"
    ann = {}
    with h5py.File(h5_path, "w") as f:
        for v in range(6):
            vid = f"s13-d{v:02d}"
            rows = int(rng.integers(40, 90))
            f.create_dataset(  # flat: one dataset per bare video id
                vid, data=rng.normal(size=(rows, 32)).astype(np.float32))
            fps, num_frames = 29.4, rows * 30
            ts, sents = [], []
            for q in range(2):
                sf = int(rng.integers(0, num_frames // 2))
                ef = int(rng.integers(sf + 30, num_frames))
                ts.append([sf, ef])  # TACoS timestamps are FRAME indices
                sents.append(f"the person chops ingredient {v} {q}.")
            # annotations key by "<vid>.avi"; features by the bare vid
            ann[vid + ".avi"] = {"fps": fps, "num_frames": num_frames,
                                 "timestamps": ts, "sentences": sents}
    for split in ("train", "test"):
        (tmp_path / f"tacos_{split}.json").write_text(
            json.dumps(ann), encoding="utf-8")

    _run_train_eval(
        "tacos_h5_cli_test", _patched_tiny("tacos_h5_cli_test", "tacos"),
        str(tmp_path / "tacos_{split}.json"), str(h5_path),
        tmp_path / "ckpt", capsys)


def test_infer_load_features_nested_h5(tmp_path):
    """infer.load_features goes through the same FeatureReader, so the
    single-query CLI accepts the public nested archives too."""
    from drn_tpu.infer import load_features

    path = tmp_path / "anet.hdf5"
    arr = np.arange(20, dtype=np.float32).reshape(5, 4)
    with h5py.File(path, "w") as f:
        f.create_group("v_abc").create_dataset("c3d_features", data=arr)
    np.testing.assert_array_equal(load_features(str(path), "v_abc"), arr)


def test_nested_h5_reader_layouts(tmp_path):
    """FeatureReader.read on the three archive layouts + the ambiguity
    guard (no CLI — direct unit pins for drn_tpu/data/features.py)."""
    from drn_tpu.data.features import FeatureReader

    path = tmp_path / "feats.h5"
    arr = np.arange(12, dtype=np.float32).reshape(4, 3)
    with h5py.File(path, "w") as f:
        f.create_dataset("flat", data=arr)
        f.create_group("nested").create_dataset("c3d_features", data=arr + 1)
        f.create_group("sole").create_dataset("embeddings", data=arr + 2)
        g = f.create_group("ambiguous")
        g.create_dataset("a", data=arr)
        g.create_dataset("b", data=arr)
        # two levels of nesting: the named match resolves to a GROUP, which
        # must raise (not silently np.asarray the child key names)
        f.create_group("deep").create_group("c3d_features").create_dataset(
            "data", data=arr)

    r = FeatureReader(str(path))
    np.testing.assert_array_equal(r.read("flat"), arr)
    np.testing.assert_array_equal(r.read("nested"), arr + 1)  # named match
    np.testing.assert_array_equal(r.read("sole"), arr + 2)    # sole child
    # ValueError (NOT KeyError): callers treat KeyError as "video missing"
    # and would swallow the re-export diagnostic (validate.py routes
    # ValueError to a per-video unreadable error instead)
    with pytest.raises(ValueError, match="ambiguous"):
        r.read("ambiguous")
    with pytest.raises(ValueError, match="deep"):
        r.read("deep")
    with pytest.raises(KeyError):
        r.read("missing_vid")

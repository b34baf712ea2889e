"""End-to-end CLI tests: `drn_tpu.train main()` → checkpoint →
`drn_tpu.evaluate main()` — the full user-facing flag path (SURVEY.md §2
L6; VERDICT r1 weak #9: no test drove the entrypoints' arg parsing).

Uses a real Charades-STA-format annotation file + .npy feature dir built
in tmp_path, so this also covers the annotation→features→train→eval wiring
on disk, not just the synthetic in-memory fixture.
"""

import re

import numpy as np
import pytest


@pytest.fixture(scope="module")
def charades_fixture(tmp_path_factory):
    """Tiny on-disk Charades-STA-format dataset (verbatim line format)."""
    root = tmp_path_factory.mktemp("charades")
    feat_dir = root / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = {"train": [], "test": []}
    for v in range(6):
        vid = f"VID{v:02d}"
        rows = int(rng.integers(40, 90))
        np.save(feat_dir / f"{vid}.npy",
                rng.normal(size=(rows, 32)).astype(np.float32))
        dur = rows / 2.0  # feature_fps=2.0 below
        for split in ("train", "test"):
            s = float(rng.uniform(0, dur * 0.6))
            e = float(rng.uniform(s + 1.0, dur))
            lines[split].append(
                f"{vid} {s:.1f} {e:.1f}##person does activity {v}."
            )
    for split, ls in lines.items():
        (root / f"charades_sta_{split}.txt").write_text(
            "\n".join(ls) + "\n", encoding="utf-8"
        )
    return root, feat_dir


@pytest.mark.slow
def test_train_then_evaluate_cli(charades_fixture, tmp_path, capsys):
    root, feat_dir = charades_fixture
    ckpt_dir = tmp_path / "ckpt"

    from drn_tpu import evaluate, train

    # tiny model via synthetic_tiny dims, but REAL charades-format data;
    # CLI overrides exercise the full argparse surface.
    import dataclasses

    from drn_tpu import config as config_mod

    tiny = config_mod.get_config("synthetic_tiny")
    patched = tiny.replace(
        name="charades_cli_test",
        model=dataclasses.replace(tiny.model, feature_dim=32),
        data=dataclasses.replace(
            tiny.data, dataset="charades", feature_type="c3d",
            feature_fps=2.0, num_clips=32,
        ),
    )
    config_mod._REGISTRY["charades_cli_test"] = patched
    try:
        train.main([
            "--config", "charades_cli_test",
            "--annotation-path", str(root / "charades_sta_{split}.txt"),
            "--feature-dir", str(feat_dir),
            "--checkpoint-dir", str(ckpt_dir),
            "--epochs", "1", "--max-steps", "2", "--batch-size", "8",
            "--lr", "1e-3",
        ])
        evaluate.main([
            "--config", "charades_cli_test",
            "--annotation-path", str(root / "charades_sta_{split}.txt"),
            "--feature-dir", str(feat_dir),
            "--checkpoint-dir", str(ckpt_dir / "charades_cli_test/stage1"),
            "--split", "test",
        ])
        out_streaming = capsys.readouterr().out
        # --device-features: same checkpoint, staged feature table —
        # identical metric lines (the flag is host-perf-only).
        evaluate.main([
            "--config", "charades_cli_test",
            "--annotation-path", str(root / "charades_sta_{split}.txt"),
            "--feature-dir", str(feat_dir),
            "--checkpoint-dir", str(ckpt_dir / "charades_cli_test/stage1"),
            "--split", "test", "--device-features",
        ])
        out_staged = capsys.readouterr().out
    finally:
        config_mod._REGISTRY.pop("charades_cli_test", None)
    # one "R@n,IoU=m: pct" line per (n, m) pair
    pairs = re.findall(r"R@(\d),IoU=([\d.]+): ([\d.]+)", out_streaming)
    assert len(pairs) == 6
    for _, _, pct in pairs:
        assert 0.0 <= float(pct) <= 100.0
    assert (re.findall(r"R@.*", out_staged)
            == re.findall(r"R@.*", out_streaming))


@pytest.mark.slow
def test_evaluate_cli_torch_checkpoint(charades_fixture, tmp_path, capsys):
    """evaluate.main --torch-checkpoint: the one-command reference-parity
    evaluation (a parity-schema .pth straight onto the test split)."""
    torch = pytest.importorskip("torch")
    import dataclasses

    from drn_tpu import config as config_mod, evaluate
    from drn_tpu.parity.torch_model import TorchDRNParity

    root, feat_dir = charades_fixture
    tiny = config_mod.get_config("synthetic_tiny")
    patched = tiny.replace(
        name="charades_cli_pth",
        model=dataclasses.replace(tiny.model, feature_dim=32),
        data=dataclasses.replace(
            tiny.data, dataset="charades", feature_type="c3d",
            feature_fps=2.0, num_clips=32,
        ),
    )
    config_mod._REGISTRY["charades_cli_pth"] = patched
    torch.manual_seed(0)
    tm = TorchDRNParity(patched.model, base_len=patched.data.num_clips)
    pth = tmp_path / "ref.pth"
    torch.save({"model": tm.state_dict()}, pth)
    try:
        evaluate.main([
            "--config", "charades_cli_pth",
            "--annotation-path", str(root / "charades_sta_{split}.txt"),
            "--feature-dir", str(feat_dir),
            "--torch-checkpoint", str(pth),
            "--split", "test",
        ])
    finally:
        config_mod._REGISTRY.pop("charades_cli_pth", None)
    out = capsys.readouterr().out
    pairs = re.findall(r"R@(\d),IoU=([\d.]+): ([\d.]+)", out)
    assert len(pairs) == 6
    assert "mIoU:" in out


@pytest.mark.slow
def test_train_preflight_gates_bad_data(charades_fixture, tmp_path, capsys):
    """--preflight: broken data must abort BEFORE any training (fast
    SystemExit), good data must proceed into the normal run."""
    import dataclasses

    from drn_tpu import config as config_mod, train

    root, feat_dir = charades_fixture
    tiny = config_mod.get_config("synthetic_tiny")
    patched = tiny.replace(
        name="charades_cli_preflight",
        model=dataclasses.replace(tiny.model, feature_dim=32),
        data=dataclasses.replace(
            tiny.data, dataset="charades", feature_type="c3d",
            feature_fps=2.0, num_clips=32,
        ),
    )
    config_mod._REGISTRY["charades_cli_preflight"] = patched
    empty = tmp_path / "empty_feats"
    empty.mkdir()
    base = [
        "--config", "charades_cli_preflight",
        "--annotation-path", str(root / "charades_sta_{split}.txt"),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--epochs", "1", "--max-steps", "1", "--batch-size", "8",
        "--preflight",
    ]
    try:
        # every sampled feature file missing -> validator errors -> exit
        with pytest.raises(SystemExit, match="preflight validation failed"):
            train.main(base + ["--feature-dir", str(empty)])
        # good data: preflight passes and one real step runs
        train.main(base + ["--feature-dir", str(feat_dir)])
    finally:
        config_mod._REGISTRY.pop("charades_cli_preflight", None)

"""Best-on-val checkpoint selection (SURVEY.md §3 Checkpointing "per
epoch / best"; VERDICT r2 item 5).

train() keeps the single best-on-val params under <ckpt_dir>/best; the
metric value survives restarts so a resumed run can't regress the best;
evaluate/infer/serve read params via prefer_best_dir.
"""

import dataclasses

import jax
import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.utils.checkpoint import (BestCheckpointTracker,
                                      CheckpointManager, prefer_best_dir)


def test_tracker_keeps_best_and_survives_restart(tmp_path):
    d = str(tmp_path / "ckpt")
    params = {"w": np.arange(4.0, dtype=np.float32)}
    tr = BestCheckpointTracker(d)
    assert tr.best_metric is None
    assert tr.update(1, params, 10.0)
    assert not tr.update(2, {"w": params["w"] * 0}, 5.0)  # worse: no save
    better = {"w": params["w"] + 7}
    assert tr.update(3, better, 30.0)
    tr.wait()
    tr.close()

    # Fresh process equivalent: metric restored, worse update refused.
    tr2 = BestCheckpointTracker(d)
    assert tr2.best_metric == 30.0
    assert not tr2.update(4, params, 20.0)
    tr2.close()

    # prefer_best_dir resolves to the populated best subdir…
    best = prefer_best_dir(d)
    assert best.endswith("best")
    # …and the params stored there are the best-epoch ones.
    restored = CheckpointManager(best).restore(
        {"params": {"w": np.zeros(4, np.float32)}}, partial=True
    )
    np.testing.assert_allclose(restored["params"]["w"], better["w"])
    # opting out returns the directory unchanged
    assert prefer_best_dir(d, prefer=False) == d


def test_prefer_best_dir_without_best(tmp_path):
    d = str(tmp_path)
    assert prefer_best_dir(d) == d  # no best subdir -> unchanged
    (tmp_path / "best").mkdir()
    assert prefer_best_dir(d) == d  # empty best subdir -> unchanged


@pytest.mark.slow
def test_train_keeps_best_epoch_params(tmp_path):
    """Scripted val metrics [1, 3, 2] across 3 epochs: best/ must hold the
    epoch-2 params, not the final ones."""
    from drn_tpu.train import train

    cfg = get_config("synthetic_tiny")
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, num_epochs=3, checkpoint_dir=str(tmp_path),
            checkpoint_every_steps=10_000, resume=False,
        ),
    )
    metrics = iter([1.0, 3.0, 2.0])
    snaps = []

    def eval_fn(state, epoch):
        snaps.append(jax.device_get(state.params))
        return next(metrics)

    final = train(cfg, eval_fn=eval_fn)
    assert len(snaps) == 3

    best_dir = prefer_best_dir(
        f"{cfg.train.checkpoint_dir}/{cfg.name}/stage{cfg.train.stage}"
    )
    assert best_dir.endswith("best")
    restored = CheckpointManager(best_dir).restore(
        {"params": jax.device_get(final.params), "step": 0,
         "val_metric": 0.0}
    )
    assert restored["val_metric"] == 3.0
    want = snaps[1]  # epoch-2 snapshot (metric 3.0)
    got = restored["params"]
    leaves_w, leaves_g = (jax.tree_util.tree_leaves(t) for t in (want, got))
    assert all(
        np.allclose(a, b, atol=1e-6) for a, b in zip(leaves_w, leaves_g)
    )
    # and the final params are NOT the best ones (training moved on)
    leaves_f = jax.tree_util.tree_leaves(jax.device_get(final.params))
    assert not all(
        np.allclose(a, b, atol=1e-6) for a, b in zip(leaves_g, leaves_f)
    )


def test_tracker_survives_corrupt_best_dir(tmp_path):
    """A corrupt or foreign-schema best/ directory sits on the RESUME
    path: the tracker must degrade to 'no prior best' with a warning, not
    crash the resume (VERDICT r3 weak #6)."""
    d = str(tmp_path / "ckpt")
    params = {"w": np.arange(4.0, dtype=np.float32)}

    # Case 1: a step directory that is garbage (killed mid-save).
    best = tmp_path / "ckpt" / "best" / "7"
    best.mkdir(parents=True)
    (best / "junk.bin").write_bytes(b"\x00not-a-checkpoint")
    with pytest.warns(UserWarning, match="best-checkpoint metric restore"):
        tr = BestCheckpointTracker(d)
    assert tr.best_metric is None
    assert tr.update(8, params, 1.0)  # next val re-anchors best
    tr.wait()
    tr.close()
    # the unreadable data was quarantined, not deleted
    assert (tmp_path / "ckpt" / "best.corrupt-0" / "7" / "junk.bin").exists()
    # …and the re-anchored best restores cleanly in a fresh tracker
    tr_re = BestCheckpointTracker(d)
    assert tr_re.best_metric == 1.0
    tr_re.close()

    # Case 2: an older-schema checkpoint without val_metric.
    d2 = str(tmp_path / "ckpt2")
    legacy = CheckpointManager(f"{d2}/best")
    legacy.save(3, {"params": params, "step": 3})  # no val_metric key
    legacy.wait()
    legacy.close()
    with pytest.warns(UserWarning, match="best-checkpoint metric restore"):
        tr2 = BestCheckpointTracker(d2)
    assert tr2.best_metric is None
    assert tr2.update(4, params, 2.0)
    tr2.wait()
    tr2.close()
    # and once re-anchored, a fresh tracker restores cleanly again
    tr3 = BestCheckpointTracker(d2)
    assert tr3.best_metric == 2.0
    tr3.close()


def test_tracker_rejects_non_finite_metrics(tmp_path):
    """A NaN val metric (diverged eval) must never become 'best': accepting
    it poisons every later comparison (m <= nan is False) and silently
    turns best-on-val into last-eval."""
    d = str(tmp_path / "ckpt")
    params = {"w": np.arange(4.0, dtype=np.float32)}
    tr = BestCheckpointTracker(d)
    assert tr.update(1, params, 0.45)
    assert not tr.update(2, {"w": params["w"] * 0}, float("nan"))
    assert tr.best_metric == 0.45
    # a later, worse-than-best metric still refused
    assert not tr.update(3, {"w": params["w"] * 0}, 0.30)
    # and a genuinely better one accepted
    assert tr.update(4, params, 0.50)
    assert not tr.update(5, params, float("inf"))  # inf equally rejected
    tr.wait()
    tr.close()


def test_quarantine_tolerates_losing_the_rename_race(tmp_path, monkeypatch):
    """Multi-process training constructs a tracker on EVERY process
    against the same shared FS; on a resume after a mid-save kill all of
    them can quarantine concurrently. The os.rename losers (source
    already moved by a peer, or target suffix taken) must recover, not
    crash inside the recovery path — a dead worker there hangs the job
    at the next collective."""
    import os as _os

    d = str(tmp_path / "ckpt")
    best = tmp_path / "ckpt" / "best" / "7"
    best.mkdir(parents=True)
    (best / "junk.bin").write_bytes(b"\x00not-a-checkpoint")

    real_rename = _os.rename
    calls = {"n": 0}

    def racing_rename(src, dst):
        # Emulate a peer process winning the same quarantine rename: the
        # first attempt finds the source already gone.
        if calls["n"] == 0 and dst.endswith(".corrupt-0"):
            calls["n"] += 1
            real_rename(src, dst)  # the "peer" moves it…
            raise FileNotFoundError(src)  # …and we lose the race
        return real_rename(src, dst)

    monkeypatch.setattr(_os, "rename", racing_rename)
    with pytest.warns(UserWarning,
                      match="best-checkpoint metric restore") as rec:
        tr = BestCheckpointTracker(d)
    # The race-loser's warning must point at the PEER'S actual quarantine
    # target, not a locally guessed (nonexistent) suffix (ADVICE r4).
    msgs = "\n".join(str(w.message) for w in rec)
    assert "best.corrupt-0" in msgs, msgs
    assert tr.best_metric is None
    params = {"w": np.arange(4.0, dtype=np.float32)}
    assert tr.update(8, params, 1.0)  # tracker fully functional after
    tr.wait()
    tr.close()
    # the peer's quarantine preserved the data
    assert (tmp_path / "ckpt" / "best.corrupt-0" / "7" / "junk.bin").exists()

    # Target-suffix contention: corrupt-0 taken → the loser bumps to -1.
    d2 = str(tmp_path / "ckpt2")
    best2 = tmp_path / "ckpt2" / "best" / "3"
    best2.mkdir(parents=True)
    (best2 / "junk.bin").write_bytes(b"\x00garbage")
    (tmp_path / "ckpt2" / "best.corrupt-0").mkdir()
    with pytest.warns(UserWarning, match="best-checkpoint metric restore"):
        tr2 = BestCheckpointTracker(d2)
    assert (tmp_path / "ckpt2" / "best.corrupt-1" / "3" / "junk.bin").exists()
    tr2.close()


def test_unrecognized_metadata_layout_does_not_quarantine_valid_best(
        tmp_path, monkeypatch):
    """An Orbax version bump can move/reshape the on-disk _METADATA the
    schema probe reads. The probe returning None ("cannot pre-check")
    must NOT count as corruption: the tracker attempts the restore and a
    VALID best checkpoint keeps its metric instead of being quarantined
    into a silent best→latest fallback."""
    d = str(tmp_path / "ckpt")
    params = {"w": np.arange(4.0, dtype=np.float32)}
    tr = BestCheckpointTracker(d)
    assert tr.update(5, params, 42.0)
    tr.wait()
    tr.close()

    monkeypatch.setattr(BestCheckpointTracker, "_has_val_metric",
                        lambda self, step: None)
    with pytest.warns(UserWarning, match="unrecognized checkpoint metadata"):
        tr2 = BestCheckpointTracker(d)
    assert tr2.best_metric == 42.0  # restored, not quarantined
    assert not (tmp_path / "ckpt" / "best.corrupt-0").exists()
    tr2.close()

    # And the probe itself is three-valued: a step dir with no readable
    # metadata reports None, never False.
    d3 = str(tmp_path / "ckpt3")
    (tmp_path / "ckpt3" / "best" / "9").mkdir(parents=True)
    t3 = BestCheckpointTracker.__new__(BestCheckpointTracker)
    t3.directory = f"{d3}/best"
    assert t3._has_val_metric(9) is None

"""Golden-file annotation-format tests (VERDICT r1 next-step #6).

Verbatim-format fixtures for each dataset's annotation file — written in
the exact shape of the public releases (SURVEY.md §3 "Annotation parsing";
unverifiable against the empty reference mount, so pinned here from the
documented formats):

  * Charades-STA: ``VID START END##sentence`` text lines
    (`charades_sta_{train,test}.txt`).
  * ActivityNet-Captions: ``{vid: {duration, timestamps: [[s,e]..],
    sentences: [..]}}`` JSON (val_1.json style).
  * TACoS: ``{vid.avi: {fps, num_frames, timestamps(frames), sentences}}``
    JSON (2D-TAN release style).

Plus the seconds path: a known feature_fps must yield a known duration and
grid mapping — the class of silent real-data corruption these tests exist
to catch before a TPU day is burned on it.
"""

import json

import numpy as np
import pytest

from drn_tpu.config import DataConfig, ModelConfig
from drn_tpu.data.datasets import (GroundingDataset, parse_charades_sta,
                                   parse_activitynet, parse_examples,
                                   parse_tacos)
from drn_tpu.data.features import FeatureReader
from drn_tpu.data.vocab import Vocab


CHARADES_LINES = """\
AO8RW 0.0 6.9##a person is putting a book on a shelf.
AO8RW 24.3 30.4##person begins to play on a phone.
S0TFD 11.2 19.6##person eating a sandwich they take off their shoes.

ZZXQF 5.1 10.8##a person is sitting on a couch reading a book. they ##laugh.
BADLN 3.5
"""


def test_charades_sta_verbatim_lines(tmp_path):
    p = tmp_path / "charades_sta_train.txt"
    p.write_text(CHARADES_LINES, encoding="utf-8")
    exs = parse_charades_sta(str(p))
    # blank line skipped; truncated meta line skipped; "##" inside the
    # sentence stays in the sentence (only the FIRST "##" splits)
    assert len(exs) == 4
    assert exs[0].video_id == "AO8RW"
    assert exs[0].start_sec == 0.0 and exs[0].end_sec == 6.9
    assert exs[0].sentence == "a person is putting a book on a shelf."
    assert exs[1].start_sec == 24.3 and exs[1].end_sec == 30.4
    assert exs[2].video_id == "S0TFD"
    assert exs[3].sentence == (
        "a person is sitting on a couch reading a book. they ##laugh."
    )
    # Charades-STA carries no duration in the annotation
    assert all(e.duration <= 0 for e in exs)


ACTIVITYNET_JSON = {
    "v_QOlSCBRmfWY": {
        "duration": 82.73,
        "timestamps": [[0.83, 19.86], [17.37, 60.81]],
        "sentences": [
            " A young woman is seen standing in a room and leads into her "
            "dancing.",
            " The girl dances around the room while the camera captures "
            "her movements.",
        ],
    },
    "v_ehGHCYKzyZ8": {
        "duration": 61.72,
        "timestamps": [[0, 61.72]],
        "sentences": ["A weight lifting tutorial is given."],
    },
}


def test_activitynet_captions_verbatim_json(tmp_path):
    p = tmp_path / "val_1.json"
    p.write_text(json.dumps(ACTIVITYNET_JSON), encoding="utf-8")
    exs = parse_activitynet(str(p))
    assert len(exs) == 3  # one Example per (video, query) pair
    by_vid = {}
    for e in exs:
        by_vid.setdefault(e.video_id, []).append(e)
    assert set(by_vid) == {"v_QOlSCBRmfWY", "v_ehGHCYKzyZ8"}
    a = by_vid["v_QOlSCBRmfWY"][0]
    assert (a.start_sec, a.end_sec, a.duration) == (0.83, 19.86, 82.73)
    assert a.sentence.strip().startswith("A young woman")
    b = by_vid["v_ehGHCYKzyZ8"][0]
    assert (b.start_sec, b.end_sec) == (0.0, 61.72)  # int timestamps → float


TACOS_JSON = {
    "s13-d21.avi": {
        "fps": 29.4,
        "num_frames": 17522,
        "timestamps": [[90, 592], [156, 3694]],
        "sentences": [
            "The person takes out a knife.",
            "The person washes the carrot.",
        ],
    },
}


def test_tacos_verbatim_json(tmp_path):
    p = tmp_path / "train.json"
    p.write_text(json.dumps(TACOS_JSON), encoding="utf-8")
    exs = parse_tacos(str(p))
    assert len(exs) == 2
    e = exs[0]
    # ".avi" stripped to match feature-file naming; FRAME stamps → seconds
    assert e.video_id == "s13-d21"
    np.testing.assert_allclose(e.start_sec, 90 / 29.4)
    np.testing.assert_allclose(e.end_sec, 592 / 29.4)
    np.testing.assert_allclose(e.duration, 17522 / 29.4)


def test_split_templating(tmp_path):
    for split in ("train", "test"):
        (tmp_path / f"charades_sta_{split}.txt").write_text(
            f"VID{split} 1.0 2.0##sentence for {split}.\n", encoding="utf-8"
        )
    cfg = DataConfig(
        dataset="charades",
        annotation_path=str(tmp_path / "charades_sta_{split}.txt"),
    )
    assert parse_examples(cfg, "train")[0].video_id == "VIDtrain"
    assert parse_examples(cfg, "test")[0].video_id == "VIDtest"
    with pytest.raises(FileNotFoundError):
        parse_examples(cfg, "val")


def test_charades_seconds_path_follows_feature_fps(tmp_path):
    """duration = raw_feature_rows / feature_fps, and the GT grid mapping
    follows: a known fps must yield known seconds (VERDICT r1 weak #5 —
    tIoU is fps-invariant, but user-facing seconds are not)."""
    ann = tmp_path / "charades_sta_train.txt"
    ann.write_text("VID00 6.0 18.0##a person does a thing.\n",
                   encoding="utf-8")
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    # 72 raw rows at 3 rows/sec → 24 s video
    rng = np.random.default_rng(0)
    np.save(feat_dir / "VID00.npy",
            rng.normal(size=(72, 16)).astype(np.float32))

    cfg = DataConfig(dataset="charades", annotation_path=str(ann),
                     feature_dir=str(feat_dir), feature_fps=3.0,
                     num_clips=32, max_query_len=8)
    mcfg = ModelConfig(feature_dim=16, vocab_size=64)
    exs = parse_examples(cfg, "train")
    ds = GroundingDataset(cfg, mcfg, Vocab.hashed(64), exs,
                          FeatureReader(str(feat_dir)))
    row = ds[0]
    assert float(row["duration"]) == pytest.approx(24.0)
    # grid = seconds * num_clips / duration: [6, 18] s → [8, 24] of 32
    np.testing.assert_allclose(row["gt_grid"], [8.0, 24.0], rtol=1e-6)
    assert row["features"].shape == (32, 16)

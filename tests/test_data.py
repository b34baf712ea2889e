"""Data layer tests: tokenizer, vocab, parsers, resampling, batching."""

import json

import numpy as np

from drn_tpu.config import get_config
from drn_tpu.data.datasets import (
    parse_activitynet,
    parse_charades_sta,
    parse_tacos,
)
from drn_tpu.data.features import resample_features
from drn_tpu.data.pipeline import BatchIterator, make_dataset
from drn_tpu.data.vocab import PAD_ID, UNK_ID, Vocab, tokenize


def test_tokenize():
    assert tokenize("A person Opens the door.") == \
        ["a", "person", "opens", "the", "door"]
    assert tokenize("it's 5 o'clock!") == ["it's", "5", "o'clock"]


def test_hashed_vocab_deterministic():
    v = Vocab.hashed(100)
    a, b = v.lookup("door"), v.lookup("door")
    assert a == b and 2 <= a < 100
    ids, mask = v.encode(["open", "the", "door"], 5)
    assert ids.shape == (5,) and mask.tolist() == [True, True, True, False, False]
    assert ids[3] == PAD_ID
    ids2, mask2 = v.encode([], 5)
    assert ids2[0] == UNK_ID and mask2[0]


def test_glove_loading(tmp_path):
    dim = 4
    p = tmp_path / "glove.txt"
    p.write_text("hello 1 2 3 4\nworld 0 0 1 0\n")
    v = Vocab.from_glove(str(p), embed_dim=dim)
    assert v.embeddings.shape == (4, dim)  # PAD, UNK, hello, world
    assert v.lookup("hello") == 2
    assert v.lookup("zzz") == UNK_ID
    np.testing.assert_allclose(v.embeddings[2], [1, 2, 3, 4])


def test_parse_charades(tmp_path):
    p = tmp_path / "charades_sta_train.txt"
    p.write_text(
        "AO8RW 0.0 6.9##a person is putting a book on a shelf.\n"
        "XYZ12 2.5 10.0##person opens the door\n"
        "malformed line without separator\n"
    )
    ex = parse_charades_sta(str(p))
    assert len(ex) == 2
    assert ex[0].video_id == "AO8RW" and ex[0].end_sec == 6.9
    assert "book" in ex[0].sentence


def test_parse_activitynet_and_tacos(tmp_path):
    anet = {"v_1": {"duration": 120.0,
                    "timestamps": [[0, 30], [40, 90]],
                    "sentences": ["first thing", "second thing"]}}
    p = tmp_path / "anet.json"
    p.write_text(json.dumps(anet))
    ex = parse_activitynet(str(p))
    assert len(ex) == 2 and ex[1].start_sec == 40 and ex[1].duration == 120.0

    tacos = {"s13-d21.avi": {"num_frames": 3000, "fps": 30.0,
                             "timestamps": [[300, 900]],
                             "sentences": ["takes out knife"]}}
    p2 = tmp_path / "tacos.json"
    p2.write_text(json.dumps(tacos))
    ex2 = parse_tacos(str(p2))
    assert ex2[0].video_id == "s13-d21"
    assert ex2[0].start_sec == 10.0 and ex2[0].duration == 100.0


def test_resample_features():
    f = np.arange(10, dtype=np.float32)[:, None]
    out = resample_features(f, 5)
    assert out.shape == (5, 1)
    np.testing.assert_allclose(out[:, 0], [0, 2.25, 4.5, 6.75, 9.0])
    out2 = resample_features(f, 10)
    np.testing.assert_allclose(out2, f)
    out3 = resample_features(f[:1], 4)
    np.testing.assert_allclose(out3[:, 0], [0, 0, 0, 0])


def test_charades_end_to_end_with_npy_features(tmp_path):
    cfg = get_config("synthetic_tiny")
    d = cfg.data
    import dataclasses
    ann = tmp_path / "charades_sta_train.txt"
    ann.write_text("VID1 1.0 5.0##person opens door\n"
                   "VID2 0.0 30.0##person reads book\n")
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    np.save(feat_dir / "VID1.npy",
            rng.normal(size=(48, cfg.model.feature_dim)).astype(np.float32))
    np.save(feat_dir / "VID2.npy",
            rng.normal(size=(30, cfg.model.feature_dim)).astype(np.float32))
    d = dataclasses.replace(
        d, dataset="charades", annotation_path=str(ann),
        feature_dir=str(feat_dir), batch_size=2,
    )
    ds = make_dataset(d, cfg.model)
    assert len(ds) == 2
    row = ds[0]
    assert row["features"].shape == (d.num_clips, cfg.model.feature_dim)
    # duration falls back to raw feature length (48) → gt scaled accordingly
    np.testing.assert_allclose(
        row["gt_grid"], [1.0 * 32 / 48, 5.0 * 32 / 48], rtol=1e-5
    )
    batches = list(BatchIterator(ds, 2, shuffle=False).epoch(0))
    assert len(batches) == 1
    assert batches[0]["features"].shape == (2, d.num_clips, cfg.model.feature_dim)


def test_batch_padding_final_ragged_batch():
    cfg = get_config("synthetic_tiny")
    ds = make_dataset(cfg.data, cfg.model)
    it = BatchIterator(ds, 100, shuffle=True, seed=3)
    bs = list(it.epoch(0))
    assert len(bs) == 3  # 256 examples / 100
    assert bs[-1]["valid"].sum() == 56
    assert bs[-1]["features"].shape[0] == 100


def test_missing_feature_file_names_video_and_dir(tmp_path):
    """A missing per-video feature file fails with the video id and the
    configured directory in the message (real-data day-1 diagnosability)."""
    import dataclasses

    import pytest as _pytest

    from drn_tpu.config import DataConfig, ModelConfig
    from drn_tpu.data.datasets import Example, GroundingDataset
    from drn_tpu.data.features import FeatureReader
    from drn_tpu.data.vocab import Vocab

    cfg = DataConfig(dataset="charades", feature_dir=str(tmp_path),
                     num_clips=8, max_query_len=4)
    mcfg = ModelConfig(feature_dim=16, vocab_size=64)
    ds = GroundingDataset(
        cfg, mcfg, Vocab.hashed(64),
        [Example("GHOST", "a sentence", 0.0, 2.0, duration=10.0)],
        FeatureReader(str(tmp_path)),
    )
    with _pytest.raises(FileNotFoundError) as ei:
        ds[0]
    msg = str(ei.value)
    assert "GHOST" in msg and str(tmp_path) in msg


def _cache_corpus(tmp_path, n_videos=3, rows=24, dim=8):
    import numpy as np

    rng = np.random.default_rng(7)
    for v in range(n_videos):
        np.save(tmp_path / f"V{v}.npy",
                rng.normal(size=(rows, dim)).astype(np.float32))


def test_feature_cache_identity_and_hits(tmp_path):
    """Cached reads return the same data as uncached ones, repeat reads
    are dict hits returning the read-only shared array, and cache=0
    disables everything (the pre-cache behavior)."""
    from drn_tpu.data.features import FeatureReader

    _cache_corpus(tmp_path)
    plain = FeatureReader(str(tmp_path))
    cached = FeatureReader(str(tmp_path), cache_mb=8.0)

    f0, t0 = plain.read_resampled("V0", 16)
    c0, ct0 = cached.read_resampled("V0", 16)
    np.testing.assert_array_equal(f0, c0)
    assert t0 == ct0 == 24
    assert not c0.flags.writeable and f0.flags.writeable

    c0b, _ = cached.read_resampled("V0", 16)
    assert c0b is c0  # identity ⇒ the hit skipped read+resample
    # a different grid is a different key, not a stale hit
    c0_8, _ = cached.read_resampled("V0", 8)
    assert c0_8.shape[0] == 8
    assert cached.cache_hits == 1 and cached.cache_misses == 2

    assert plain.cache_mb == 0.0
    p0b, _ = plain.read_resampled("V0", 16)
    assert p0b is not f0 and plain.cache_hits == 0


def test_feature_cache_byte_budget_evicts_lru(tmp_path):
    from drn_tpu.data.features import FeatureReader

    _cache_corpus(tmp_path, n_videos=3, rows=24, dim=8)
    # one (16, 8) fp32 grid = 512 B; budget fits exactly two entries
    r = FeatureReader(str(tmp_path), cache_mb=1100 / 1e6)
    a, _ = r.read_resampled("V0", 16)
    r.read_resampled("V1", 16)
    r.read_resampled("V0", 16)  # refresh V0 → V1 is now LRU
    r.read_resampled("V2", 16)  # evicts V1
    assert r._cache._bytes <= 1100
    a2, _ = r.read_resampled("V0", 16)
    assert a2 is a  # V0 survived
    before = r.cache_misses
    r.read_resampled("V1", 16)  # V1 was evicted → miss
    assert r.cache_misses == before + 1


def test_feature_cache_pickles_to_fresh_empty_cache(tmp_path):
    """Grain pickles the data source into worker processes: the lock and
    cache must not travel, and the clone must still read correctly."""
    import pickle

    from drn_tpu.data.features import FeatureReader

    _cache_corpus(tmp_path)
    r = FeatureReader(str(tmp_path), cache_mb=8.0)
    orig, _ = r.read_resampled("V1", 16)
    clone = pickle.loads(pickle.dumps(r))
    assert clone.cache_mb == 8.0 and clone.cache_hits == 0
    got, _ = clone.read_resampled("V1", 16)
    assert got is not orig
    np.testing.assert_array_equal(got, orig)


def test_feature_cache_batches_bit_identical(tmp_path):
    """End-to-end: an epoch drained through the cached default equals the
    cache=0 epoch bit-for-bit (the knob is host-perf-only)."""
    import dataclasses

    cfg = get_config("synthetic_tiny")
    ann = tmp_path / "charades_sta_train.txt"
    ann.write_text("".join(
        f"V{v} {s}.0 {s + 3}.0##query {v} {s}\n"
        for v in range(3) for s in range(2)))
    _cache_corpus(tmp_path, n_videos=3, rows=24,
                  dim=cfg.model.feature_dim)
    base = dataclasses.replace(
        cfg.data, dataset="charades", annotation_path=str(ann),
        feature_dir=str(tmp_path), batch_size=4, feature_fps=1.0)
    for cache_mb in (64.0, 0.0):
        d = dataclasses.replace(base, feature_cache_mb=cache_mb)
        ds = make_dataset(d, cfg.model)
        assert ds.reader.cache_mb == cache_mb
        batches = list(BatchIterator(ds, 4, shuffle=False).epoch(0))
        if cache_mb:
            cached_batches = batches
            assert ds.reader.cache_hits > 0
        else:
            assert ds.reader.cache_hits == 0
    assert len(cached_batches) == len(batches)
    for a, b in zip(cached_batches, batches):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_effective_feature_fps_guard():
    """Unset feature_fps (0.0) assumes 1.0 with ONE warning; an explicit
    rate — even 1.0 — is silent (VERDICT r2: silent-wrong-seconds must be
    impossible without an explicit opt-in)."""
    import warnings

    import drn_tpu.data.features as F

    F._warned_default_fps = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert F.effective_feature_fps(0.0) == 1.0
        assert F.effective_feature_fps(0.0) == 1.0  # warn only once
    assert len(w) == 1 and "feature_fps" in str(w[0].message)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert F.effective_feature_fps(1.0) == 1.0
        assert F.effective_feature_fps(24.0) == 24.0
    assert not w

"""Grain host-pipeline tests: content equivalence with the in-process
iterator, fixed-shape padding of the ragged final batch, worker processes."""

import dataclasses

import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.data.pipeline import (BatchIterator, GrainBatchIterator,
                                   make_batch_iterator, make_dataset)


@pytest.fixture(scope="module")
def ds():
    cfg = get_config("synthetic_tiny")
    d = make_dataset(cfg.data, cfg.model, split="train")
    d.num_examples = 21  # deliberately ragged vs batch_size=8
    d._examples = d._examples[:21]
    return d


def test_grain_matches_simple_iterator_unshuffled(ds):
    simple = list(BatchIterator(ds, 8, shuffle=False).epoch(0))
    grain = list(GrainBatchIterator(ds, 8, shuffle=False,
                                    worker_count=0).epoch(0))
    assert len(simple) == len(grain) == 3
    for bs, bg in zip(simple, grain):
        assert bs.keys() == bg.keys()
        for k in bs:
            np.testing.assert_array_equal(bs[k], bg[k])


def test_grain_final_batch_padding(ds):
    batches = list(GrainBatchIterator(ds, 8, shuffle=False,
                                      worker_count=0).epoch(0))
    last = batches[-1]
    assert last["features"].shape[0] == 8
    assert last["valid"][:5].all() and not last["valid"][5:].any()
    # padded rows keep the invariants the model relies on
    assert last["query_mask"][5:, 0].all()
    np.testing.assert_array_equal(
        last["gt_grid"][5:], np.tile([0.0, 1.0], (3, 1))
    )


def test_grain_shuffles_differently_per_epoch(ds):
    it = GrainBatchIterator(ds, 8, shuffle=True, seed=3, worker_count=0)
    e0 = np.concatenate([b["gt_grid"] for b in it.epoch(0)])
    e1 = np.concatenate([b["gt_grid"] for b in it.epoch(1)])
    e0_again = np.concatenate([b["gt_grid"] for b in it.epoch(0)])
    assert not np.array_equal(e0, e1)          # reshuffled
    np.testing.assert_array_equal(e0, e0_again)  # deterministic


def _valid_rows_sorted(batches):
    """All valid example rows across batches, sorted by a content key.

    Workers batch their own record shards, so batch composition differs by
    worker_count; the multiset of examples must not.
    """
    feats = np.concatenate([b["features"] for b in batches])
    valid = np.concatenate([b["valid"] for b in batches])
    gts = np.concatenate([b["gt_grid"] for b in batches])
    order = np.lexsort((gts[:, 1], gts[:, 0]))
    order = order[valid[order]]
    return feats[order], gts[order]


def test_grain_worker_processes(ds):
    """worker_count > 0 spawns real processes; example multiset and
    determinism must be preserved."""
    inproc = list(GrainBatchIterator(ds, 8, shuffle=False,
                                     worker_count=0).epoch(0))
    procs = list(GrainBatchIterator(ds, 8, shuffle=False,
                                    worker_count=2).epoch(0))
    procs2 = list(GrainBatchIterator(ds, 8, shuffle=False,
                                     worker_count=2).epoch(0))
    f0, g0 = _valid_rows_sorted(inproc)
    f1, g1 = _valid_rows_sorted(procs)
    f2, g2 = _valid_rows_sorted(procs2)
    np.testing.assert_array_equal(g0, g1)
    np.testing.assert_array_equal(f0, f1)
    np.testing.assert_array_equal(f1, f2)  # deterministic across runs


def test_make_batch_iterator_dispatch(ds):
    cfg = get_config("synthetic_tiny").data
    assert isinstance(
        make_batch_iterator(ds, cfg, shuffle=False, seed=0), BatchIterator
    )
    cfg_w = dataclasses.replace(cfg, num_workers=2)
    assert isinstance(
        make_batch_iterator(ds, cfg_w, shuffle=False, seed=0),
        GrainBatchIterator,
    )


class _CountingDS:
    """Proxy dataset that records every __getitem__ record index."""

    def __init__(self, inner):
        self.inner = inner
        self.reads = []

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, i):
        self.reads.append(int(i))
        return self.inner[int(i)]

    def __repr__(self):  # stable: Grain pins repr(source) in get_state
        return f"_CountingDS({self.inner!r})"


def test_grain_state_resume_reads_nothing_twice(ds):
    """get_state()/resume_state: the resumed epoch yields exactly the
    uninterrupted run's remaining batches and re-reads ZERO records from
    the consumed batches (VERDICT r2 item 7). Consumed-record identity is
    derived from batch CONTENT — the raw read log also contains records
    Grain prefetched for the next batch, which a resume legitimately
    re-reads."""
    # record index <- content fingerprint
    fp = {ds[i]["features"].tobytes(): i for i in range(len(ds))}

    counted = _CountingDS(ds)
    it = GrainBatchIterator(counted, 8, shuffle=True, seed=5,
                            worker_count=0)
    gen = it.epoch(0)
    first = [next(gen), next(gen)]
    state = it.get_state()
    assert state is not None
    gen.close()
    consumed = {
        fp[b["features"][r].tobytes()]
        for b in first for r in range(8) if b["valid"][r]
    }
    assert len(consumed) == 16

    # uninterrupted reference
    ref = list(GrainBatchIterator(ds, 8, shuffle=True, seed=5,
                                  worker_count=0).epoch(0))

    counted2 = _CountingDS(ds)
    it2 = GrainBatchIterator(counted2, 8, shuffle=True, seed=5,
                             worker_count=0)
    rest = list(it2.epoch(0, resume_state=state))
    assert it2.get_state() is None  # cleared after the epoch drains
    assert len(first) + len(rest) == len(ref)
    for got, want in zip(first + rest, ref):
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])
    # the resumed run read ONLY the never-consumed records
    assert set(counted2.reads) == set(range(len(ds))) - consumed


@pytest.mark.slow
def test_train_mid_epoch_resume_skips_reads_with_grain_state(
        tmp_path, monkeypatch):
    """End-to-end: train 3 steps (checkpoint each), restart; the resumed
    run must not read any record consumed before the checkpoint."""
    import drn_tpu.train as T

    cfg = get_config("synthetic_tiny")
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, checkpoint_dir=str(tmp_path),
            checkpoint_every_steps=1, num_epochs=1, eval_every_epochs=0,
        ),
    )

    counters = []

    def patched_iterator(dataset, dcfg, *, shuffle, seed):
        counted = _CountingDS(dataset)
        counters.append(counted)
        return GrainBatchIterator(counted, dcfg.batch_size,
                                  shuffle=shuffle, seed=seed,
                                  worker_count=0)

    monkeypatch.setattr(T, "make_batch_iterator", patched_iterator)

    T.train(cfg, max_steps=3)
    reads_before = set(counters[0].reads)
    assert reads_before  # the first run did read

    T.train(cfg, max_steps=6)  # resumes from step 3
    reads_after = counters[1].reads
    assert reads_after  # continued training reads the remaining records
    # The 3 skipped batches (3 x 8 = 24 records) must NOT be replayed.
    # Grain's prefetch threads may legitimately read ahead of the 3 newly
    # consumed steps (up to the whole remaining epoch), so the invariant
    # is on the consumed prefix: at most 256 - 24 distinct records can
    # appear. A consume-and-discard replay reads all 256.
    assert len(set(reads_after)) <= 256 - 3 * 8, len(set(reads_after))

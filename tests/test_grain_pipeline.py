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

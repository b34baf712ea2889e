"""Host batching pipeline → fixed-shape, device-ready batches.

Reference equivalent: DataLoader + collate_fn (SURVEY.md §4.4), rebuilt for
XLA's static-shape world: every batch has exactly `batch_size` rows; the
final ragged batch is padded and masked via `valid`, so one compiled
train/eval step serves the whole epoch. `shard` optionally splits batches
for a `data`-axis mesh (the DistributedSampler analogue — each process/
device slice sees a disjoint contiguous row block of every global batch).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from drn_tpu.config import DataConfig, ModelConfig
from drn_tpu.data.vocab import Vocab
from drn_tpu.data.datasets import load_dataset


def build_vocab(cfg: DataConfig, mcfg: ModelConfig) -> Vocab:
    """The run's single vocabulary, shared by every split and the model.

    GloVe mode filters the table to the words appearing in the dataset's
    annotations (all splits, so train/eval ids agree — the reference's
    dataset-restricted torchtext vocab); offline fallback is the hashed
    vocab. The returned vocab's `embeddings` must be passed to
    `build_model` so the embedding table and the id space match.
    """
    if not cfg.glove_path:
        return Vocab.hashed(mcfg.vocab_size)
    if cfg.dataset == "synthetic":
        return Vocab.from_glove(cfg.glove_path, mcfg.embed_dim)
    from drn_tpu.data.datasets import parse_examples
    from drn_tpu.data.vocab import tokenize

    words = set()
    for split in ("train", "test", "val"):
        try:
            for ex in parse_examples(cfg, split):
                words.update(tokenize(ex.sentence, cfg.lowercase))
        except (FileNotFoundError, KeyError, ValueError):
            continue
    return Vocab.from_glove(cfg.glove_path, mcfg.embed_dim,
                            filter_words=words or None)


def make_dataset(cfg: DataConfig, mcfg: ModelConfig, vocab: Optional[Vocab] = None,
                 split: str = "train"):
    if vocab is None:
        vocab = build_vocab(cfg, mcfg)
    return load_dataset(cfg, mcfg, vocab, split)


def _pad_batch_rows(batch: Dict[str, np.ndarray], batch_size: int
                    ) -> Dict[str, np.ndarray]:
    """Pad a ragged final batch to the fixed batch size (masked via `valid`)."""
    n = batch["valid"].shape[0]
    pad = batch_size - n
    if pad <= 0:
        return batch
    out = {}
    for k, v in batch.items():
        block = np.zeros((pad,) + v.shape[1:], v.dtype)
        out[k] = np.concatenate([v, block])
    out["valid"][n:] = False
    out["gt_grid"][n:] = np.asarray([0.0, 1.0], np.float32)
    out["query_mask"][n:, 0] = True  # keep LSTM lengths >= 1
    return out


def invalid_like(template: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """An all-invalid batch shaped like `template` — the lockstep filler a
    short-sharded process feeds so it can join every collective (train and
    eval both use it; the invariants match _pad_batch_rows' padded rows:
    valid all-False, gt_grid a nondegenerate [0,1] span, query_mask
    keeping LSTM lengths >= 1)."""
    local = {k: np.zeros_like(v) for k, v in template.items()}
    local["gt_grid"] = np.broadcast_to(
        np.asarray([0.0, 1.0], np.float32), template["gt_grid"].shape
    ).copy()
    local["query_mask"][:, 0] = True
    return local


class GrainBatchIterator:
    """Grain-backed loader: parallel worker processes for the feature-file
    reads (the DataLoader-worker equivalent, SURVEY.md §4.4 "fork boundary"),
    per-process sharding for multi-host DP (the DistributedSampler
    equivalent), deterministic per-epoch shuffling, fixed-shape batches.

    Same `.epoch(i)` / `len()` interface as BatchIterator so train/eval code
    is agnostic; select it with DataConfig.num_workers > 0.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, worker_count: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.worker_count = worker_count
        self._live_it = None  # current epoch's DataLoaderIterator

    def __len__(self):
        import jax

        # each process sees only its ShardByJaxProcess record shard
        local = -(-len(self.dataset) // jax.process_count())
        return -(-local // self.batch_size)

    def get_state(self) -> Optional[bytes]:
        """Grain iterator state (JSON bytes) as of the last yielded batch
        of the epoch currently being iterated; None between epochs.
        Checkpoint it alongside the train state, then resume with
        `epoch(..., resume_state=state)` — zero feature reads for the
        already-consumed batches."""
        return self._live_it.get_state() if self._live_it else None

    def epoch(self, epoch_idx: int = 0, skip_batches: int = 0,
              resume_state: Optional[bytes] = None
              ) -> Iterator[Dict[str, np.ndarray]]:
        # NOTE: a fresh DataLoader (and worker pool) per epoch keeps the
        # per-epoch reshuffle semantics simple; the pool restart costs
        # seconds against minutes of epoch time.
        # Mid-epoch resume: `resume_state` (a get_state() blob saved with
        # the checkpoint) restores Grain's own iterator position — no
        # reads for the skipped batches. Without it, `skip_batches`
        # consumes-and-discards (Grain's shuffle order lives in its
        # samplers, so a stateless skip can't be index arithmetic); the
        # caller skips FULL epochs arithmetically either way, so at most
        # one partial epoch replays on a state-less resume.
        import grain.python as gp

        sampler = gp.IndexSampler(
            num_records=len(self.dataset),
            shard_options=gp.ShardByJaxProcess(drop_remainder=False),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=self.seed + epoch_idx,
        )
        loader = gp.DataLoader(
            data_source=self.dataset,
            sampler=sampler,
            operations=[gp.Batch(self.batch_size, drop_remainder=False)],
            worker_count=self.worker_count,
        )
        it = iter(loader)
        if resume_state is not None:
            try:
                it.set_state(resume_state)
                skip_batches = 0  # the state already points past them
            except Exception as e:  # stale/mismatched blob: replay instead
                import warnings

                warnings.warn(
                    f"grain loader state rejected ({e}); falling back to "
                    f"consume-and-discard skip of {skip_batches} batches"
                )
        self._live_it = it
        try:
            for i, batch in enumerate(it):
                if i < skip_batches:
                    continue
                yield _pad_batch_rows(batch, self.batch_size)
        finally:
            self._live_it = None


def make_batch_iterator(dataset, cfg: DataConfig, *, shuffle: bool,
                        seed: int):
    """Grain pipeline when num_workers > 0, simple in-process otherwise."""
    if getattr(cfg, "num_workers", 0) > 0:
        return GrainBatchIterator(dataset, cfg.batch_size, shuffle=shuffle,
                                  seed=seed, worker_count=cfg.num_workers)
    return BatchIterator(dataset, cfg.batch_size, shuffle=shuffle, seed=seed)


class BatchIterator:
    """Deterministic epoch iterator over a GroundingDataset-like object."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_remainder: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder

    def __len__(self):
        n = len(self.dataset)
        b = self.batch_size
        return n // b if self.drop_remainder else -(-n // b)

    def epoch(self, epoch_idx: int = 0, skip_batches: int = 0
              ) -> Iterator[Dict[str, np.ndarray]]:
        """`skip_batches` resumes mid-epoch WITHOUT materializing the
        skipped batches (pure index arithmetic — no feature reads)."""
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + epoch_idx).shuffle(idx)
        b = self.batch_size
        stop = (n // b) * b if self.drop_remainder else n
        for off in range(skip_batches * b, stop, b):
            take = idx[off : off + b]
            rows = [self.dataset[int(i)] for i in take]
            pad = b - len(rows)
            if pad:
                blank = {k: np.zeros_like(v) for k, v in rows[0].items()}
                blank["valid"] = np.bool_(False)
                blank["gt_grid"] = np.asarray([0.0, 1.0], np.float32)
                blank["query_mask"] = rows[0]["query_mask"] * False
                blank["query_mask"][0] = True  # keep LSTM lengths >= 1
                rows.extend([blank] * pad)
            yield {
                k: np.stack([r[k] for r in rows]) for k in rows[0].keys()
            }

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


def make_dataset(cfg: DataConfig, mcfg: ModelConfig, vocab: Optional[Vocab] = None,
                 split: str = "train"):
    if vocab is None:
        vocab = (
            Vocab.from_glove(cfg.glove_path, mcfg.embed_dim)
            if cfg.glove_path
            else Vocab.hashed(mcfg.vocab_size)
        )
    return load_dataset(cfg, mcfg, vocab, split)


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

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + epoch_idx).shuffle(idx)
        b = self.batch_size
        stop = (n // b) * b if self.drop_remainder else n
        for off in range(0, stop, b):
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

"""Tokenizer + vocabulary with GloVe or offline hashed fallback.

Reference equivalent: torchtext GloVe lookup inside the Dataset classes
(SURVEY.md §3 "Datasets"). Two modes:

  * GloVe mode: `Vocab.from_glove(path)` parses a `word v1 ... v300` text
    file; `embedding_matrix` feeds `TextEmbedding.pretrained`.
  * Hashed mode (no network, no GloVe file — SURVEY.md §8 "GloVe offline"):
    words map deterministically to `vocab_size` buckets via crc32, and the
    embedding table is randomly initialized + trained.

IDs 0/1 are reserved for PAD/UNK in both modes.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

PAD_ID = 0
UNK_ID = 1
_NUM_RESERVED = 2

_TOKEN_RE = re.compile(r"[a-z0-9']+")


def tokenize(sentence: str, lowercase: bool = True) -> List[str]:
    if lowercase:
        sentence = sentence.lower()
    return _TOKEN_RE.findall(sentence)


class Vocab:
    def __init__(
        self,
        size: int,
        word_to_id: Optional[Dict[str, int]] = None,
        embeddings: Optional[np.ndarray] = None,
    ):
        self.size = size
        self.word_to_id = word_to_id  # None → hashed mode
        self.embeddings = embeddings

    @classmethod
    def hashed(cls, size: int) -> "Vocab":
        return cls(size=size)

    @classmethod
    def from_glove(cls, path: str, embed_dim: int = 300,
                   max_words: int = 400_000,
                   filter_words: Optional[set] = None) -> "Vocab":
        """Parse a GloVe text file. With `filter_words` (the dataset's
        token set — reference behavior: vocab restricted to dataset words),
        only those rows are kept, shrinking the embedding table from 400k
        rows to a few thousand."""
        words, vecs = [], []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split(" ")
                if len(parts) != embed_dim + 1:
                    continue  # malformed / header line
                if filter_words is not None and parts[0] not in filter_words:
                    continue
                words.append(parts[0])
                vecs.append(np.asarray(parts[1:], np.float32))
                if len(words) >= max_words:
                    break
        if not words:
            raise ValueError(f"no usable GloVe rows in {path!r}")
        table = np.zeros((len(words) + _NUM_RESERVED, embed_dim), np.float32)
        table[_NUM_RESERVED:] = np.stack(vecs)
        table[UNK_ID] = table[_NUM_RESERVED:].mean(axis=0)
        w2i = {w: i + _NUM_RESERVED for i, w in enumerate(words)}
        return cls(size=table.shape[0], word_to_id=w2i, embeddings=table)

    def lookup(self, word: str) -> int:
        if self.word_to_id is None:
            h = zlib.crc32(word.encode("utf-8"))
            return _NUM_RESERVED + h % (self.size - _NUM_RESERVED)
        return self.word_to_id.get(word, UNK_ID)

    def encode(self, tokens: Sequence[str], max_len: int
               ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (ids (max_len,) int32, mask (max_len,) bool); truncates/pads."""
        ids = np.full((max_len,), PAD_ID, np.int32)
        mask = np.zeros((max_len,), bool)
        for i, tok in enumerate(tokens[:max_len]):
            ids[i] = self.lookup(tok)
            mask[i] = True
        if not mask.any():  # empty query → single UNK so the LSTM has input
            ids[0] = UNK_ID
            mask[0] = True
        return ids, mask

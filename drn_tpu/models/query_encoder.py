"""Query encoder: word embeddings → multi-layer BiLSTM → per-level vectors.

Mirrors the reference's GloVe + nn.LSTM encoder (SURVEY.md §3 "Query
encoder"): each pyramid level gets its own query representation taken from a
different LSTM depth (coarser levels see deeper layers). The recurrence runs
via `flax.linen.RNN` (lax.scan under jit) in float32 with explicit
`seq_lengths` masking for padded queries — the TPU-friendly replacement for
cuDNN packed sequences.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from drn_tpu.config import ModelConfig


class TextEmbedding(nn.Module):
    """Embedding table; optionally initialized from pretrained GloVe rows.

    When `pretrained` is None the table is random — paired with the hashed
    vocab in drn_tpu.data.vocab it forms the offline fallback (SURVEY.md §8
    "GloVe offline"). `trainable=False` freezes it via stop_gradient.
    """

    vocab_size: int
    embed_dim: int
    pretrained: Optional[np.ndarray] = None
    trainable: bool = True

    @nn.compact
    def __call__(self, ids):
        if self.pretrained is not None:
            pre = np.asarray(self.pretrained, np.float32)
            assert pre.shape == (self.vocab_size, self.embed_dim)
            init = lambda key, shape, dtype: jnp.asarray(pre, dtype)
        else:
            init = nn.initializers.normal(0.1)
        table = self.param(
            "embedding", init, (self.vocab_size, self.embed_dim), jnp.float32
        )
        if not self.trainable:
            table = jax.lax.stop_gradient(table)
        return jnp.take(table, ids, axis=0)


class QueryEncoder(nn.Module):
    cfg: ModelConfig
    pretrained_embeddings: Optional[np.ndarray] = None
    freeze_embeddings: bool = False

    @nn.compact
    def __call__(self, word_ids, query_mask) -> List[jnp.ndarray]:
        """word_ids (B, L) int32, query_mask (B, L) bool → one (B, D) per level."""
        cfg = self.cfg
        x = TextEmbedding(
            cfg.vocab_size,
            cfg.embed_dim,
            pretrained=self.pretrained_embeddings,
            trainable=not self.freeze_embeddings,
            name="embedding",
        )(word_ids)
        x = x.astype(jnp.float32)
        lengths = jnp.maximum(query_mask.sum(axis=-1).astype(jnp.int32), 1)

        half = cfg.hidden_dim // 2
        layer_outputs = []
        h = x
        for i in range(cfg.num_lstm_layers):
            fwd = nn.RNN(
                nn.OptimizedLSTMCell(half, dtype=jnp.float32),
                name=f"lstm_fwd_{i}",
            )(h, seq_lengths=lengths)
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(half, dtype=jnp.float32),
                reverse=True,
                keep_order=True,
                name=f"lstm_bwd_{i}",
            )(h, seq_lengths=lengths)
            h = jnp.concatenate([fwd, bwd], axis=-1)  # (B, L, D)
            layer_outputs.append(h)

        mask_f = query_mask[..., None].astype(jnp.float32)
        denom = jnp.maximum(mask_f.sum(axis=1), 1.0)
        queries = []
        for level in range(cfg.num_levels):
            src = layer_outputs[min(level, cfg.num_lstm_layers - 1)]
            pooled = (src * mask_f).sum(axis=1) / denom  # masked mean-pool
            q = nn.Dense(cfg.hidden_dim, dtype=jnp.float32,
                         name=f"query_proj_{level}")(pooled)
            queries.append(jnp.tanh(q))
        return queries

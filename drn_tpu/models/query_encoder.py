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


_GATE_ORDER = ("i", "f", "g", "o")  # torch/flax LSTM gate convention


class QueryEncoder(nn.Module):
    """`fast=True` (default) runs both directions of every BiLSTM layer in
    ONE `lax.scan` with stacked weights and precomputed input projections —
    60 sequential batched matmuls instead of 240 small ones (the TPU
    replacement for cuDNN's fused LSTM). Column-block exact vs the
    per-direction `nn.RNN` formulation at every VALID position; padded
    positions may differ (nn.RNN freezes carries past seq_lengths) but are
    masked out of the pooled queries either way — pinned by
    tests/test_model.py::test_fast_lstm_matches_rnn_path. The param tree is
    created by (and identical to) the `nn.RNN` path, so the torch-parity
    conversion schema is unchanged."""

    cfg: ModelConfig
    pretrained_embeddings: Optional[np.ndarray] = None
    freeze_embeddings: bool = False
    fast: bool = True

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
        if self.is_initializing() or not self.fast:
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
        else:
            # Fast path: the cells' params were created by the init path
            # above; read them and run the fused recurrence.
            p = self.variables["params"]
            l = x.shape[1]
            ar = jnp.arange(l)
            # flip the VALID prefix of each row, padding stays in place
            # (flax flip_sequences semantics for the reverse direction).
            flip_idx = jnp.where(
                ar[None, :] < lengths[:, None],
                lengths[:, None] - 1 - ar[None, :],
                ar[None, :],
            )

            def flip(t):
                return jnp.take_along_axis(t, flip_idx[..., None], axis=1)

            for i in range(cfg.num_lstm_layers):
                cells = [p[f"OptimizedLSTMCell_{2 * i}"],
                         p[f"OptimizedLSTMCell_{2 * i + 1}"]]
                w_ih = jnp.stack([
                    jnp.concatenate(
                        [c[f"i{g}"]["kernel"] for g in _GATE_ORDER], axis=1)
                    for c in cells
                ])                                           # (2, in, 4H)
                w_hh = jnp.stack([
                    jnp.concatenate(
                        [c[f"h{g}"]["kernel"] for g in _GATE_ORDER], axis=1)
                    for c in cells
                ])                                           # (2, H, 4H)
                bias = jnp.stack([
                    jnp.concatenate(
                        [c[f"h{g}"]["bias"] for g in _GATE_ORDER])
                    for c in cells
                ])                                           # (2, 4H)

                xs = jnp.stack([h, flip(h)])                 # (2, B, L, in)
                xproj = (jnp.einsum("sbli,sif->sblf", xs, w_ih)
                         + bias[:, None, None, :])
                xproj = jnp.moveaxis(xproj, 2, 0)            # (L, 2, B, 4H)

                def step(carry, xp, w_hh=w_hh):
                    c, hh = carry
                    z = xp + jnp.einsum("sbh,shf->sbf", hh, w_hh)
                    zi, zf, zg, zo = jnp.split(z, 4, axis=-1)
                    c2 = (nn.sigmoid(zf) * c
                          + nn.sigmoid(zi) * jnp.tanh(zg))
                    h2 = nn.sigmoid(zo) * jnp.tanh(c2)
                    return (c2, h2), h2

                b = h.shape[0]
                init = (jnp.zeros((2, b, half), jnp.float32),
                        jnp.zeros((2, b, half), jnp.float32))
                # NOTE: scan unroll=4 was measured SLOWER for fwd+bwd
                # (30.4 vs 28.9 ms/train-step at B=384) — the reverse-mode
                # scan dominates the encoder's 6 ms backward share and
                # unrolling inflates its residuals. Keep the plain scan.
                _, outs = jax.lax.scan(jax.checkpoint(step), init, xproj)
                fwd = jnp.moveaxis(outs[:, 0], 0, 1)         # (B, L, H)
                bwd = flip(jnp.moveaxis(outs[:, 1], 0, 1))
                h = jnp.concatenate([fwd, bwd], axis=-1)
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

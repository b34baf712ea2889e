"""The assembled DRN model (reference: `model/DRN.py`, SURVEY.md §3-§4).

One functional forward pass, fully static shapes:

    features (B, T, F), word_ids (B, L), query_mask (B, L)
      → query encoder → per-level query vectors
      → backbone      → per-level video features
      → fusion        → query-conditioned pyramid inputs   [hot op: Pallas]
      → temporal FPN  → pyramid
      → heads         → dense (d_start, d_end), match logits, IoU logits

Outputs are flattened over pyramid levels into (B, N) tensors with static
per-location metadata (locations, strides, level ids) so target assignment
and decoding are single vectorized ops (SURVEY.md §8 "dense target
assignment under jit").
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from drn_tpu.config import ModelConfig
from drn_tpu.models.backbone import Backbone
from drn_tpu.models.fpn import TemporalFPN
from drn_tpu.models.fusion import CrossModalFusion
from drn_tpu.models.heads import GroundingHeads, IoUHead
from drn_tpu.models.query_encoder import QueryEncoder
from drn_tpu.ops.temporal import decode_segments, pyramid_locations


def location_metadata(cfg: ModelConfig, base_len: int):
    """Static flattened per-location metadata: (locations, strides, level_ids)."""
    locs = pyramid_locations(base_len, cfg.num_levels)
    strides = [np.full((base_len // 2 ** l,), float(2 ** l), np.float32)
               for l in range(cfg.num_levels)]
    level_ids = [np.full((base_len // 2 ** l,), l, np.int32)
                 for l in range(cfg.num_levels)]
    return (
        jnp.concatenate(locs),
        jnp.asarray(np.concatenate(strides)),
        jnp.asarray(np.concatenate(level_ids)),
    )


class DRN(nn.Module):
    cfg: ModelConfig
    base_len: int
    pretrained_embeddings: Optional[np.ndarray] = None
    freeze_embeddings: bool = False

    @nn.compact
    def __call__(self, features, word_ids, query_mask) -> Dict[str, Any]:
        cfg = self.cfg
        assert self.base_len % (2 ** (cfg.num_levels - 1)) == 0, (
            "num_clips must be divisible by the coarsest pyramid stride"
        )

        queries = QueryEncoder(
            cfg,
            pretrained_embeddings=self.pretrained_embeddings,
            freeze_embeddings=self.freeze_embeddings,
            name="query_encoder",
        )(word_ids, query_mask)
        v_levels = Backbone(cfg, name="backbone")(features)
        fused = [
            CrossModalFusion(cfg, name=f"fusion_{l}")(v_levels[l], queries[l])
            for l in range(cfg.num_levels)
        ]
        pyramid = TemporalFPN(cfg, name="fpn")(fused)

        # Heads run ONCE over all levels (flat, level-major) — see heads.py.
        d_start, d_end, match_logits = GroundingHeads(cfg, name="heads")(pyramid)

        # Flat decode for the IoU head (no gradient through sampling
        # positions — two-stage recipe, SURVEY.md §4.2).
        locs, strides, level_ids = location_metadata(cfg, self.base_len)
        segments = jax.lax.stop_gradient(
            decode_segments(locs, d_start, d_end, float(self.base_len))
        )
        iou_logits = IoUHead(cfg, name="iou_head")(
            pyramid, segments, level_ids, strides
        )

        return {
            "d_start": d_start,            # (B, N) base-grid units
            "d_end": d_end,                # (B, N)
            "match_logits": match_logits,  # (B, N)
            "iou_logits": iou_logits,      # (B, N)
            "segments": segments,          # (B, N, 2) base-grid units
        }

"""Dense anchor-free heads: boundary regression, semantic matching, IoU.

Reference equivalents: `model/grounding_head.py` / `model/iou_head.py`
(SURVEY.md §3). Conv towers are SHARED across pyramid levels (FCOS-style),
with a learnable per-level scale on the regression output. Distances are
predicted as exp(scale * raw) * stride — always positive, level-calibrated,
in base-grid units.

The IoU head samples pyramid features at the regressed segment's start /
mid / end (linear interpolation along time) and predicts the tIoU that the
regressed segment achieves against GT; trained second-stage, used to
rescore candidates at inference.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from drn_tpu.config import ModelConfig
from drn_tpu.models.layers import ConvBlock, cdt, linear_time_sample


class _Tower(nn.Module):
    cfg: ModelConfig
    out_channels: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.cfg.head_tower_layers):
            x = ConvBlock(self.cfg, self.cfg.hidden_dim, kernel_size=3,
                          name=f"tower_{i}")(x)
        return nn.Conv(self.out_channels, kernel_size=(3,), padding="SAME",
                       dtype=cdt(self.cfg), name="out")(x)


class GroundingHeads(nn.Module):
    """Location + matching heads over all pyramid levels."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, pyramid: List[jnp.ndarray]
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray]]:
        cfg = self.cfg
        loc_tower = _Tower(cfg, 2, name="loc")
        match_tower = _Tower(cfg, 1, name="match")
        d_start, d_end, match_logits = [], [], []
        for l, feat in enumerate(pyramid):
            stride = float(2 ** l)
            scale = self.param(f"scale_{l}", nn.initializers.ones, ())
            raw = loc_tower(feat).astype(jnp.float32)  # (B, T_l, 2)
            d = jnp.exp(scale * raw) * stride  # base-grid units, > 0
            d_start.append(d[..., 0])
            d_end.append(d[..., 1])
            match_logits.append(
                match_tower(feat).astype(jnp.float32)[..., 0]
            )
        return d_start, d_end, match_logits


class IoUHead(nn.Module):
    """Segment-conditioned quality head (second-stage trained)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        pyramid: List[jnp.ndarray],
        segments: List[jnp.ndarray],
        strides: Sequence[float],
    ) -> List[jnp.ndarray]:
        """segments[l]: (B, T_l, 2) regressed spans in base-grid units
        (already stop_gradient'ed by the caller). Returns per-level
        (B, T_l) IoU logits."""
        cfg = self.cfg
        d = cfg.hidden_dim
        mixers = [
            ConvBlock(cfg, d, kernel_size=1, name=f"mix_{i}")
            for i in range(cfg.iou_head_layers)
        ]
        out_conv = nn.Conv(1, kernel_size=(1,), dtype=cdt(cfg), name="out")

        logits = []
        for feat, seg, stride in zip(pyramid, segments, strides):
            start, end = seg[..., 0], seg[..., 1]
            mid = 0.5 * (start + end)
            # base-grid coords → fractional level-local indices
            to_idx = lambda p: p / stride - 0.5
            sampled = jnp.concatenate(
                [
                    linear_time_sample(feat, to_idx(start)),
                    linear_time_sample(feat, to_idx(mid)),
                    linear_time_sample(feat, to_idx(end)),
                ],
                axis=-1,
            )  # (B, T_l, 3D)
            x = sampled.astype(cdt(cfg))
            for m in mixers:
                x = m(x)
            logits.append(out_conv(x).astype(jnp.float32)[..., 0])
        return logits

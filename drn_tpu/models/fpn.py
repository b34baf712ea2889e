"""Temporal FPN: top-down pathway over the fused pyramid.

Reference equivalent: `model/fpn.py` (SURVEY.md §3 "Temporal FPN"): lateral
1x1 convs + nearest-neighbor 2x temporal upsampling + smoothing convs.
Requires each level's length to be exactly 2x the next coarser level's
(guaranteed by config: num_clips divisible by 2^(num_levels-1)).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from drn_tpu.config import ModelConfig
from drn_tpu.models.layers import ConvBlock, cdt


class TemporalFPN(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, levels: List[jnp.ndarray]) -> List[jnp.ndarray]:
        cfg = self.cfg
        n = len(levels)
        laterals = [
            ConvBlock(cfg, cfg.hidden_dim, kernel_size=1, use_act=False,
                      name=f"lateral_{l}")(levels[l])
            for l in range(n)
        ]
        outs: List[jnp.ndarray] = [None] * n  # type: ignore[list-item]
        outs[-1] = laterals[-1]
        for l in range(n - 2, -1, -1):
            up = jnp.repeat(outs[l + 1], 2, axis=1)  # nearest-neighbor 2x
            outs[l] = laterals[l] + up
        return [
            ConvBlock(cfg, cfg.hidden_dim, kernel_size=3, name=f"smooth_{l}")(
                outs[l].astype(cdt(cfg))
            )
            for l in range(n)
        ]

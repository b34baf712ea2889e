"""Shared building blocks: 1-D conv wrapper, linear temporal sampling.

Convs run in the config compute dtype (bfloat16 by default → MXU-friendly);
normalization and reductions stay in float32.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from drn_tpu.config import ModelConfig


def cdt(cfg: ModelConfig):
    return jnp.dtype(cfg.dtype)


def pdt(cfg: ModelConfig):
    return jnp.dtype(cfg.param_dtype)


class ConvBlock(nn.Module):
    """Conv1d (+LayerNorm, +ReLU) on (B, T, C)."""

    cfg: ModelConfig
    features: int
    kernel_size: int = 3
    stride: int = 1
    use_norm: bool = True
    use_act: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding="SAME",
            dtype=cdt(self.cfg),
            param_dtype=pdt(self.cfg),
        )(x)
        if self.use_norm:
            x = nn.LayerNorm(dtype=jnp.float32, param_dtype=pdt(self.cfg))(
                x.astype(jnp.float32)
            ).astype(cdt(self.cfg))
        if self.use_act:
            x = nn.relu(x)
        return x


def linear_time_sample(feat: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Linearly interpolate features along time.

    feat: (B, T, D); pos: (B, N) fractional indices in [0, T-1].
    Returns (B, N, D). Used by the IoU head to sample the pyramid at the
    regressed segment's start/mid/end (SURVEY.md §3 "IoU regression head").
    """
    t = feat.shape[1]
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (pos - lo.astype(pos.dtype))[..., None]
    f_lo = jnp.take_along_axis(feat, lo[..., None], axis=1)
    f_hi = jnp.take_along_axis(feat, hi[..., None], axis=1)
    return f_lo * (1.0 - w) + f_hi * w

"""Shared building blocks: 1-D conv wrapper, linear temporal sampling.

Convs run in the config compute dtype (bfloat16 by default → MXU-friendly);
normalization and reductions stay in float32. On TPU with
`use_pallas_fusion`, the whole conv→LN→ReLU block runs as ONE Pallas
kernel (ops/pallas/conv_block.py) — no HBM round-trip of the conv output
between the conv and the LayerNorm.
"""

from __future__ import annotations

import jax
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
        cin = x.shape[-1]
        w_bytes = self.kernel_size * cin * self.features * 2  # bf16 resident
        t = x.shape[1]
        use_pallas = (
            self.cfg.use_pallas_conv_blocks
            and jax.default_backend() == "tpu"
            and not self.is_initializing()
            # the kernel's stride-2 pair-reshape taps support widths 1/3
            # only (conv_block.py docstring) — wider odd kernels would
            # index past the scratch rows
            and self.kernel_size in (1, 3)
            and self.stride in (1, 2)
            and w_bytes <= 8 * 2**20  # stem (Cin=4096) stays on XLA
            # ragged time lengths (head towers' gap-padded concat, T=114)
            # force Mosaic relayouts that cost more than the fusion saves
            and t % 16 == 0 and (t // self.stride) % 16 == 0
        )
        if use_pallas:
            # One whole-block kernel; the submodules are not CALLED here,
            # so read their params directly (init always takes the XLA
            # path below, which creates them with these names).
            from drn_tpu.ops.pallas.conv_block import conv_ln_relu

            p = self.variables["params"]
            w = p["Conv_0"]["kernel"].astype(cdt(self.cfg))
            b = p["Conv_0"]["bias"].astype(cdt(self.cfg))
            if self.use_norm:
                scale = p["LayerNorm_0"]["scale"]
                offset = p["LayerNorm_0"]["bias"]
            else:
                scale = jnp.ones((self.features,), jnp.float32)
                offset = jnp.zeros((self.features,), jnp.float32)
            return conv_ln_relu(
                x.astype(cdt(self.cfg)), w, b, scale, offset,
                self.stride, self.use_norm, self.use_act,
            )
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
    Returns (B, N, D) in the promoted (fp32) dtype. Used by the IoU head to
    sample the pyramid at the regressed segment's start/mid/end (SURVEY.md
    §3 "IoU regression head").

    Implemented as two one-hot batched matmuls rather than
    `take_along_axis`: per-row gathers are vector-unit work on TPU and
    dominated the whole eval step (measured 5.0 ms of a 9.4 ms step at
    B=384 — scripts/sample_probe.py), while the equivalent selection
    matmuls ride the MXU in <0.3 ms. Numerically IDENTICAL to the gather
    form: the 0/1 selection entries are exact in any float dtype, each
    output row accumulates exactly one nonzero product in fp32, and the
    two-term lerp is unchanged — so the torch-twin parity stays bit-level.
    """
    t = feat.shape[1]
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos)
    hi = jnp.minimum(lo + 1.0, t - 1.0)
    w = (pos - lo)[..., None].astype(jnp.float32)
    grid = jnp.arange(t, dtype=pos.dtype)
    sel = jnp.stack(
        [grid == lo[..., None], grid == hi[..., None]], axis=0
    ).astype(feat.dtype)                       # (2, B, N, T) exact 0/1
    # No preferred_element_type: each output row accumulates exactly one
    # nonzero product, so the contraction is exact in feat's own dtype
    # (matching what take_along_axis returned), and the CPU backend's dot
    # thunk lacks mixed bf16->f32 support.
    f = jnp.einsum("sbnt,btd->sbnd", sel, feat)
    return f[0] * (1.0 - w) + f[1] * w

"""Dense anchor-free heads: boundary regression, semantic matching, IoU.

Reference equivalents: `model/grounding_head.py` / `model/iou_head.py`
(SURVEY.md §3). Conv towers are SHARED across pyramid levels (FCOS-style),
with a learnable per-level scale on the regression output. Distances are
predicted as exp(scale * raw) * stride — always positive, level-calibrated,
in base-grid units.

TPU-first batching: instead of running the towers once per pyramid level
(many small convs — 3 launches of T=64/32/16 at the flagship shapes), all
levels are concatenated along time with ONE zero "gap" column between
consecutive levels, and the towers run once over the (B, N+L-1, D) tensor.
The gap column is re-zeroed after every conv block, so each conv reads
exactly the zeros a per-level 'SAME' conv would pad — the outputs at the
real positions are bit-identical to the per-level formulation (verified by
the torch-twin parity test, which keeps the per-level form). Valid for
kernel size 3 (receptive radius 1 per conv); asserted below.

The IoU head samples pyramid features at the regressed segment's start /
mid / end (linear interpolation along time, clipped inside the location's
own level) and predicts the tIoU the regressed segment achieves against GT;
trained second-stage, used to rescore candidates at inference. Its 1x1
convs need no gaps and run once over the flat (B, N, 3D) samples.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from drn_tpu.config import ModelConfig
from drn_tpu.models.layers import ConvBlock, cdt, linear_time_sample


def _gap_layout(sizes: Sequence[int]) -> np.ndarray:
    """Flat indices of the real (non-gap) columns in the gap-padded
    concatenation (one shared zero column between consecutive levels)."""
    idx, off = [], 0
    for i, t in enumerate(sizes):
        idx.append(np.arange(off, off + t))
        off += t + (1 if i + 1 < len(sizes) else 0)
    return np.concatenate(idx)


def _gap_concat(levels: List[jnp.ndarray]
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate (B, T_l, D) levels along time with one zero gap column
    between consecutive levels. Returns the tensor and the (1, total, 1)
    validity mask (layout matches `_gap_layout`)."""
    b, _, d = levels[0].shape
    parts, mask_parts = [], []
    for i, lvl in enumerate(levels):
        parts.append(lvl)
        mask_parts.append(np.ones((lvl.shape[1],), np.float32))
        if i + 1 < len(levels):
            parts.append(jnp.zeros((b, 1, d), lvl.dtype))
            mask_parts.append(np.zeros((1,), np.float32))
    mask = jnp.asarray(np.concatenate(mask_parts))[None, :, None]
    return jnp.concatenate(parts, axis=1), mask


class _Tower(nn.Module):
    """Shared conv tower over the gap-padded concatenation; re-zeroes the
    gap columns after every block so convs never leak across levels."""

    cfg: ModelConfig
    out_channels: int

    @nn.compact
    def __call__(self, x, mask):
        for i in range(self.cfg.head_tower_layers):
            x = ConvBlock(self.cfg, self.cfg.hidden_dim, kernel_size=3,
                          name=f"tower_{i}")(x)
            x = x * mask.astype(x.dtype)
        return nn.Conv(self.out_channels, kernel_size=(3,), padding="SAME",
                       dtype=cdt(self.cfg), name="out")(x)


class GroundingHeads(nn.Module):
    """Location + matching heads over all pyramid levels, one tower pass.

    Returns flat (B, N) tensors ordered level-major (level 0 first)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, pyramid: List[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        # The single shared zero gap column supports conv receptive radius
        # 1 only — the towers' kernels are fixed at width 3 (in _Tower).
        sizes = [p.shape[1] for p in pyramid]
        valid_idx = _gap_layout(sizes)
        x, mask = _gap_concat(pyramid)

        raw_loc = _Tower(cfg, 2, name="loc")(x, mask).astype(jnp.float32)
        raw_match = _Tower(cfg, 1, name="match")(x, mask).astype(jnp.float32)
        raw_loc = raw_loc[:, valid_idx, :]        # (B, N, 2)
        match_logits = raw_match[:, valid_idx, 0]  # (B, N)

        scales, strides = [], []
        for l, t in enumerate(sizes):
            s = self.param(f"scale_{l}", nn.initializers.ones, ())
            scales.append(jnp.full((t,), 1.0) * s)
            strides.append(np.full((t,), float(2 ** l), np.float32))
        scale_vec = jnp.concatenate(scales)               # (N,)
        stride_vec = jnp.asarray(np.concatenate(strides))  # (N,)

        # Soft-capped exponent: exp(C·tanh(z/C)) ≈ exp(z) near 0 but bounds
        # d to e^±C·stride with a gradient that never dies. A hard exp
        # explodes within a few Adam steps (sign-like updates move z by
        # ~|x|·lr·fan_in per step at width 512), after which decode clipping
        # zeroes every regression gradient permanently — observed as
        # reg_loss frozen from step 2 at the flagship config.
        c = 8.0
        z = scale_vec[None, :, None] * raw_loc
        d = jnp.exp(c * jnp.tanh(z / c)) * stride_vec[None, :, None]
        return d[..., 0], d[..., 1], match_logits


# Below this many total locations the flat single-einsum form wins: the
# per-level split's extra dispatches/concats cost more than the spared
# block-diagonal-zero FLOPs. Measured same-day A/B on v5e (iters=96):
# charades_i3d (3 levels, N=112, B=64) flat 76.8k q/s vs blocked
# 68.3–70.9k (−9%); charades_c3d (N=112, B=48) neutral within noise;
# activitynet (4 levels, N=480) blocked +5–17%; tacos (N=960) blocked
# +13%. The two forms are bit-identical, so the switch is purely a
# performance decision.
_BLOCKED_SAMPLING_MIN_LOCATIONS = 256


def flat_segment_samples(
    pyramid: List[jnp.ndarray], pos: jnp.ndarray, sizes: Sequence[int]
) -> jnp.ndarray:
    """One selection einsum over the level concat (small-grid fast path)."""
    n = sum(sizes)
    s = linear_time_sample(jnp.concatenate(pyramid, axis=1), pos)
    return jnp.concatenate(
        [s[:, :n], s[:, n : 2 * n], s[:, 2 * n :]], axis=-1
    )


def blocked_segment_samples(
    pyramid: List[jnp.ndarray], pos: jnp.ndarray, sizes: Sequence[int]
) -> jnp.ndarray:
    """Sample start/mid/end features per level from flat positions.

    `pos` is (B, 3N) flat fractional indices laid out
    [start(N), mid(N), end(N)], each block level-major, every position
    already clipped inside its own level's [lo_ℓ, hi_ℓ]. Because of that
    clipping the (3N, N) selection matrix over the level concat is
    block-diagonal by level — so sample each level's rows against that
    level's features only. At 4-level configs this is ~2.7× fewer
    selection FLOPs (Σ(3T_ℓ)·T_ℓ vs 3N·N: ~22% of the whole TACoS eval
    step) and a (3T_ℓ, T_ℓ) instead of (3N, N) materialized selection
    tensor. Bit-identical to `flat_segment_samples`:
    `pos − lo_ℓ` is EXACT in fp32 (Sterbenz: pos ∈ [lo_ℓ, lo_ℓ+T_ℓ−1] and
    lo_ℓ ≥ T_ℓ−1 for every level — level offsets grow at least as fast as
    level sizes), so floor/weights/selections match the flat computation
    exactly (pinned by tests/test_layers.py).

    Returns (B, N, 3D): per location, the start/mid/end samples stacked
    along channels.
    """
    n = sum(sizes)
    starts = np.cumsum([0] + list(sizes[:-1]))
    parts = []
    for lvl, (p_l, t_l) in enumerate(zip(pyramid, sizes)):
        off = int(starts[lvl])
        lo_l = float(off)
        blk = lambda k: pos[:, k * n + off : k * n + off + t_l] - lo_l
        pos_l = jnp.concatenate([blk(0), blk(1), blk(2)], axis=1)
        s = linear_time_sample(p_l, pos_l)                  # (B, 3T_ℓ, D)
        parts.append(jnp.concatenate(
            [s[:, :t_l], s[:, t_l : 2 * t_l], s[:, 2 * t_l :]], axis=-1
        ))                                                  # (B, T_ℓ, 3D)
    return jnp.concatenate(parts, axis=1)                   # (B, N, 3D)


class IoUHead(nn.Module):
    """Segment-conditioned quality head (second-stage trained); one pass
    over the flat location grid."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        pyramid: List[jnp.ndarray],
        segments: jnp.ndarray,        # (B, N, 2) base-grid, stop-gradient'ed
        level_ids: jnp.ndarray,       # (N,) int32
        strides: jnp.ndarray,         # (N,) float32
    ) -> jnp.ndarray:
        cfg = self.cfg
        sizes = [p.shape[1] for p in pyramid]
        n = sum(sizes)
        starts_i = np.cumsum([0] + sizes[:-1])  # level offsets, shared below
        lo = jnp.asarray(starts_i.astype(np.float32))[level_ids]  # (N,)
        hi = lo + jnp.asarray(np.asarray(sizes, np.float32))[level_ids] - 1.0

        start, end = segments[..., 0], segments[..., 1]
        mid = 0.5 * (start + end)
        # base-grid coords → flat fractional indices, clipped inside the
        # location's own level so interpolation never crosses levels.
        to_idx = lambda p: jnp.clip(p / strides - 0.5 + lo, lo, hi)
        # One sampling call for start/mid/end → one pair of selection
        # matmuls instead of three (see linear_time_sample).
        pos = jnp.concatenate(
            [to_idx(start), to_idx(mid), to_idx(end)], axis=1)  # (B, 3N)
        blocked = n >= _BLOCKED_SAMPLING_MIN_LOCATIONS
        fold = (blocked and n >= cfg.iou_fold_mix_min_locations
                and not self.is_initializing())
        if fold:
            # Fold mix_0 through the (linear) sampling:
            #   mix0(concat_k(Sel_k @ F)) == Σ_k Sel_k @ (F @ W0_k) + b0
            # so the (B, N, 3D) sampled intermediate never exists — the
            # three projected per-level features are sampled directly and
            # summed. Equivalent up to bf16 accumulation order (in-module
            # A/B 1.862 → 1.126 ms at TACoS shapes,
            # scripts/iou_mix_probe.py). Shape-gated: wins at long grids
            # (TACoS +9.4%), loses at ActivityNet's — measured threshold
            # trail in design.md §4.2 and config.py.
            # Init always takes the unfolded branch below, which creates
            # mix_0's params with these names (same pattern as
            # ConvBlock's Pallas path, layers.py).
            p0 = self.variables["params"]["mix_0"]
            w0 = p0["Conv_0"]["kernel"][0].astype(cdt(cfg))    # (3D, D)
            # Per-tap width from the param itself, NOT cfg.hidden_dim: if a
            # future config decouples pyramid width from hidden_dim the
            # slices below would silently mis-align (ADVICE r4).
            d = w0.shape[0] // 3
            assert w0.shape[0] == 3 * pyramid[0].shape[-1], (
                w0.shape, pyramid[0].shape)
            parts = []
            for lvl, (p_l, t_l) in enumerate(zip(pyramid, sizes)):
                off = int(starts_i[lvl])
                acc = None
                x_l = p_l.astype(cdt(cfg))
                for k in range(3):
                    y = x_l @ w0[k * d:(k + 1) * d]            # (B, T_ℓ, D)
                    pos_lk = pos[:, k * n + off: k * n + off + t_l] \
                        - float(off)  # exact (Sterbenz; see blocked_*)
                    s = linear_time_sample(y, pos_lk)
                    acc = s if acc is None else acc + s
                parts.append(acc)
            x = jnp.concatenate(parts, axis=1) \
                + p0["Conv_0"]["bias"]                          # (B, N, D)
            # mix_0's LayerNorm+ReLU, applied functionally to its params
            # (exactly ConvBlock's fp32 norm path, layers.py)
            x = nn.relu(
                nn.LayerNorm(dtype=jnp.float32).apply(
                    {"params": p0["LayerNorm_0"]}, x.astype(jnp.float32)
                ).astype(cdt(cfg))
            )
            first = 1
        else:
            sample = (blocked_segment_samples if blocked
                      else flat_segment_samples)  # measured switch, above
            sampled = sample(pyramid, pos, sizes)               # (B, N, 3D)
            x = sampled.astype(cdt(cfg))
            first = 0
        for i in range(first, cfg.iou_head_layers):
            x = ConvBlock(cfg, cfg.hidden_dim, kernel_size=1,
                          name=f"mix_{i}")(x)
        out = nn.Conv(1, kernel_size=(1,), dtype=cdt(cfg), name="out")(x)
        return out.astype(jnp.float32)[..., 0]  # (B, N)

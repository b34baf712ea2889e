"""Temporal segment math: 1-D IoU, dense decode, pyramid location grids.

Pure `jnp`, shape-polymorphic over leading batch dims, no data-dependent
control flow — everything here is jit/vmap/grad-safe. The reference keeps
this logic in NumPy post-processing (SURVEY.md §4.3, L2); here it is
on-device and fused into the eval step.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def temporal_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """1-D temporal IoU between segments.

    a: (..., 2), b: (..., 2) with broadcastable leading dims; each segment is
    (start, end). Degenerate/empty segments yield IoU 0.
    """
    inter_lo = jnp.maximum(a[..., 0], b[..., 0])
    inter_hi = jnp.minimum(a[..., 1], b[..., 1])
    inter = jnp.clip(inter_hi - inter_lo, 0.0)
    len_a = jnp.clip(a[..., 1] - a[..., 0], 0.0)
    len_b = jnp.clip(b[..., 1] - b[..., 0], 0.0)
    union = len_a + len_b - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-8), 0.0)


def pyramid_locations(base_len: int, num_levels: int) -> Tuple[jnp.ndarray, ...]:
    """Per-level 1-D location coordinates on the base temporal grid.

    Level l has stride 2**l and length base_len // 2**l; location i sits at
    the center of its cell: (i + 0.5) * stride, in base-grid units.
    """
    out = []
    for l in range(num_levels):
        stride = 2 ** l
        t_l = base_len // stride
        idx = jnp.arange(t_l, dtype=jnp.float32)
        out.append((idx + 0.5) * stride)
    return tuple(out)


def decode_segments(
    locations: jnp.ndarray,
    d_start: jnp.ndarray,
    d_end: jnp.ndarray,
    max_len: float,
    clip: bool = True,
) -> jnp.ndarray:
    """Dense decode: segment = (loc - d_start, loc + d_end).

    locations: (T,) base-grid coords; d_start/d_end: (..., T) nonneg distances
    in base-grid units. Returns (..., T, 2). `clip=True` bounds the segment
    to the grid (inference); the training loss uses clip=False so an
    oversized segment still feels a gradient toward shrinking (a clipped
    segment's tIoU is constant in d — gradients die exactly when the
    prediction is worst).
    """
    start = locations - d_start
    end = locations + d_end
    if clip:
        start = jnp.clip(start, 0.0, max_len)
        end = jnp.clip(end, 0.0, max_len)
    end = jnp.maximum(end, start)  # guarantee non-degenerate ordering
    return jnp.stack([start, end], axis=-1)


def flatten_pyramid(per_level: Sequence[jnp.ndarray], axis: int = 1) -> jnp.ndarray:
    """Concatenate per-level dense outputs (B, T_l, ...) along the time axis."""
    return jnp.concatenate(list(per_level), axis=axis)

"""R@n, IoU@m recall metrics, computed on device.

Mirrors the reference's `compute_IoU_recall_topN` semantics (SURVEY.md §4.3):
for each query, a hit at (n, m) iff any of the top-n *NMS-surviving*
candidates has temporal IoU >= m with the ground-truth segment.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

from drn_tpu.ops.temporal import temporal_iou

# Counts-dict key for the mean-top-1-IoU accumulator (kept alongside the
# (n, m) recall keys so every consumer — device accumulation, cross-host
# reduction, the NumPy oracle — treats it uniformly). Must stay
# homogeneous with the (int, float) recall keys: jitted outputs are
# pytrees and JAX sorts dict keys, so a string key would fail to compare.
MIOU_KEY = (0, -1.0)


def metric_name(key: Tuple) -> str:
    """Human name for a counts-dict key: (1, 0.5) → "R@1,IoU=0.5"."""
    if tuple(key) == MIOU_KEY:
        return "mIoU"
    n, m = key
    return f"R@{n},IoU={m:g}"


def recall_at_n(
    sorted_segments: jnp.ndarray,
    keep: jnp.ndarray,
    gt: jnp.ndarray,
    ns: Sequence[int] = (1, 5),
    iou_thresholds: Sequence[float] = (0.3, 0.5, 0.7),
    valid: jnp.ndarray | None = None,
) -> Dict[Tuple[int, float], jnp.ndarray]:
    """Per-(n, m) hit counts for a batch of queries.

    sorted_segments: (B, K, 2) score-descending candidates (NMS order),
    keep: (B, K) bool NMS survival mask, gt: (B, 2). `valid` (B,) masks
    padding queries in the final ragged batch. Returns {(n, m): hits} with
    scalar float hit counts (sum over valid queries); divide by the number of
    valid queries outside.
    """
    b, k, _ = sorted_segments.shape
    iou = temporal_iou(sorted_segments, gt[:, None, :])  # (B, K)
    iou = jnp.where(keep, iou, 0.0)
    # rank among kept candidates: 1-indexed position if kept, else K+1
    rank = jnp.cumsum(keep.astype(jnp.int32), axis=1)
    rank = jnp.where(keep, rank, k + 1)
    if valid is None:
        valid = jnp.ones((b,), dtype=bool)
    out: Dict[Tuple[int, float], jnp.ndarray] = {}
    for n in ns:
        in_top_n = rank <= n
        for m in iou_thresholds:
            hit = jnp.any(in_top_n & (iou >= m), axis=1)
            out[(n, float(m))] = jnp.sum(hit & valid).astype(jnp.float32)
    # mIoU: the top-1 surviving candidate's tIoU, summed over valid queries
    # (standard companion metric to R@n; divide by n_valid outside, like
    # the hit counts).
    top1_iou = jnp.sum(jnp.where(rank == 1, iou, 0.0), axis=1)
    out[MIOU_KEY] = jnp.sum(jnp.where(valid, top1_iou, 0.0)).astype(
        jnp.float32)
    return out

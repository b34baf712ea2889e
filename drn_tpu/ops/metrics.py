"""R@n, IoU@m recall metrics, computed on device.

Mirrors the reference's `compute_IoU_recall_topN` semantics (SURVEY.md §4.3):
for each query, a hit at (n, m) iff any of the top-n *NMS-surviving*
candidates has temporal IoU >= m with the ground-truth segment.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

from drn_tpu.ops.temporal import temporal_iou


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
    return out

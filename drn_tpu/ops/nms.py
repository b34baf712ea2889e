"""On-device temporal NMS.

The reference runs 1-D NMS per query in serial NumPy — its post-processing
bottleneck (SURVEY.md §4.3/§4.5). Here NMS is a fixed-shape O(K^2) masked
sweep under `lax.fori_loop`, vmapped over the query batch, so the whole
decode→rank→suppress path stays on the TPU inside one jitted eval step.

K (candidates after top-k) is ~48, so the K^2 IoU matrix is tiny; the win is
avoiding host round-trips and Python loops entirely.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from drn_tpu.ops.temporal import temporal_iou


def temporal_nms(
    segments: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy 1-D NMS over K candidates (single query).

    segments: (K, 2), scores: (K,). Returns (order, keep, sorted_segments):
    `order` (K,) indices sorted by score desc, `keep` (K,) bool aligned with
    `order`, `sorted_segments` (K, 2) = segments[order]. Suppression follows
    score order exactly like the NumPy original: a candidate is kept iff no
    higher-scoring *kept* candidate overlaps it above `iou_threshold`.
    """
    k = scores.shape[0]
    order = jnp.argsort(-scores)
    segs = segments[order]
    iou = temporal_iou(segs[:, None, :], segs[None, :, :])  # (K, K)

    # K-step masked sweep. A while-loop-until-fixpoint formulation
    # (keep = ¬∃ kept suppressor, iterated to convergence) was measured
    # SLOWER at flagship shapes (scripts/nms_probe.py: 42.7 vs 28.7 µs
    # random, B=K=48) — the batched while's per-iteration convergence
    # reduction costs more than the short boolean fori_loop body, which
    # XLA pipelines well. Either way NMS is ~3% of the eval step.
    def body(i, keep):
        # Suppress all lower-ranked candidates overlapping candidate i,
        # but only if i itself is still alive.
        alive_i = keep[i]
        lower = jnp.arange(k) > i
        suppress = lower & (iou[i] > iou_threshold) & alive_i
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, k, body, jnp.ones((k,), dtype=bool))
    return order, keep, segs


@partial(jax.jit, static_argnames=("iou_threshold",))
def batched_temporal_nms(segments, scores, iou_threshold: float):
    """vmapped NMS: segments (B, K, 2), scores (B, K)."""
    return jax.vmap(lambda s, sc: temporal_nms(s, sc, iou_threshold))(
        segments, scores
    )

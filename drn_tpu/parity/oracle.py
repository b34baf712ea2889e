"""NumPy post-processing oracle: the reference's serial inference semantics.

The reference (SURVEY.md §4.3 `test.py`) scores dense locations, flattens
pyramid levels, takes top-k, runs serial greedy 1-D NMS per query, and
counts R@n,IoU@m hits — all in NumPy on the host. This module reproduces
those semantics verbatim (plain Python loops, no vectorization tricks) so
the on-device jitted eval step can be pinned against it END TO END: same
ranked segments, same survival mask, same recall counts.

Used by tests/test_parity.py to prove the whole inference path — not just
the network forward — matches the reference formulation.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _tiou(a: np.ndarray, b: np.ndarray) -> float:
    """Temporal IoU of two [start, end) segments (degenerate-safe)."""
    inter = max(0.0, min(a[1], b[1]) - max(a[0], b[0]))
    union = max(a[1], b[1]) - min(a[0], b[0])
    return inter / union if union > 0 else 0.0


def nms_serial(segments: np.ndarray, scores: np.ndarray,
               iou_threshold: float) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy NMS for ONE query, exactly the reference's loop.

    Returns (order, keep): `order` = indices sorted by score descending
    (stable on ties, matching lax.top_k/argsort tie-breaking), `keep` =
    bool mask aligned with `order`.
    """
    order = np.argsort(-scores, kind="stable")
    k = len(order)
    keep = np.ones(k, dtype=bool)
    for i in range(k):
        if not keep[i]:
            continue
        for j in range(i + 1, k):
            if keep[j] and _tiou(segments[order[i]],
                                 segments[order[j]]) > iou_threshold:
                keep[j] = False
    return order, keep


def reference_postprocess(
    outputs: Dict[str, np.ndarray],
    gt: np.ndarray,
    valid: np.ndarray,
    *,
    top_k: int,
    nms_iou_threshold: float,
    score_use_iou_head: bool = True,
    # Mirrors EvalConfig.score_iou_weight's measured default; pass 1.0
    # for the reference's exact score product (SURVEY.md §4.3).
    score_iou_weight: float = 0.25,
    ns: Sequence[int] = (1, 5),
    iou_thresholds: Sequence[float] = (0.3, 0.5, 0.7),
):
    """Full reference inference post-processing for a batch.

    outputs: model head outputs — "segments" (B, L, 2) in grid units,
    "match_logits"/"iou_logits" (B, L). gt: (B, 2) grid units.

    Returns dict with:
      "sorted_segments" (B, K, 2) — top-k candidates in score order,
      "keep" (B, K) — NMS survival aligned with that order,
      "scores" (B, K) — scores in that order,
      "counts" {(n, m): hits} — recall hit counts over valid queries.
    """
    segments = np.asarray(outputs["segments"], np.float64)
    score = _sigmoid(np.asarray(outputs["match_logits"], np.float64))
    if score_use_iou_head and score_iou_weight > 0.0:
        iou_s = _sigmoid(np.asarray(outputs["iou_logits"], np.float64))
        score = score * iou_s ** score_iou_weight

    b = segments.shape[0]
    all_segs = np.zeros((b, top_k, 2))
    all_keep = np.zeros((b, top_k), bool)
    all_scores = np.zeros((b, top_k))
    from drn_tpu.ops.metrics import MIOU_KEY

    counts: Dict[Tuple, float] = {
        (n, float(m)): 0.0 for n in ns for m in iou_thresholds
    }
    counts[MIOU_KEY] = 0.0
    for q in range(b):
        # top-k by score (stable ties), then serial NMS in that order
        top = np.argsort(-score[q], kind="stable")[:top_k]
        segs_q, scores_q = segments[q][top], score[q][top]
        order, keep = nms_serial(segs_q, scores_q, nms_iou_threshold)
        segs_q, scores_q = segs_q[order], scores_q[order]
        all_segs[q], all_keep[q], all_scores[q] = segs_q, keep, scores_q
        if not valid[q]:
            continue
        # the metric's definition: a hit at (n, m) iff any of the top-n
        # NMS-surviving candidates reaches tIoU >= m with the ground truth
        kept_idx = [i for i in range(top_k) if keep[i]]
        for n in ns:
            top_n = kept_idx[:n]
            for m in iou_thresholds:
                if any(_tiou(segs_q[i], gt[q]) >= m for i in top_n):
                    counts[(n, float(m))] += 1.0
        if kept_idx:  # mIoU: the top surviving candidate's tIoU
            counts[MIOU_KEY] += _tiou(segs_q[kept_idx[0]], gt[q])
    return {
        "sorted_segments": all_segs,
        "keep": all_keep,
        "scores": all_scores,
        "counts": counts,
    }

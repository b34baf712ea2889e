"""Oracle tests: tIoU / decode / NMS / recall vs straightforward NumPy."""

import numpy as np
import jax.numpy as jnp
import pytest

from drn_tpu.ops import (
    batched_temporal_nms,
    decode_segments,
    pyramid_locations,
    recall_at_n,
    temporal_iou,
)


def np_iou(a, b):
    inter = max(0.0, min(a[1], b[1]) - max(a[0], b[0]))
    union = max(0.0, a[1] - a[0]) + max(0.0, b[1] - b[0]) - inter
    return inter / union if union > 0 else 0.0


def np_nms(segs, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep_idx = []
    for i in order:
        if all(np_iou(segs[i], segs[j]) <= thresh for j in keep_idx):
            keep_idx.append(i)
    return keep_idx


def test_iou_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    a = np.sort(rng.uniform(0, 100, (256, 2)), axis=-1).astype(np.float32)
    b = np.sort(rng.uniform(0, 100, (256, 2)), axis=-1).astype(np.float32)
    got = np.asarray(temporal_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([np_iou(x, y) for x, y in zip(a, b)], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_iou_degenerate_and_disjoint():
    a = jnp.array([[5.0, 5.0], [0.0, 1.0], [0.0, 2.0]])
    b = jnp.array([[4.0, 6.0], [2.0, 3.0], [1.0, 2.0]])
    got = np.asarray(temporal_iou(a, b))
    np.testing.assert_allclose(got, [0.0, 0.0, 0.5], atol=1e-6)


def test_pyramid_locations():
    locs = pyramid_locations(8, 3)
    np.testing.assert_allclose(np.asarray(locs[0]), np.arange(8) + 0.5)
    np.testing.assert_allclose(np.asarray(locs[1]), [1.0, 3.0, 5.0, 7.0])
    np.testing.assert_allclose(np.asarray(locs[2]), [2.0, 6.0])


def test_decode_clips_and_orders():
    locs = jnp.array([2.0, 4.0])
    seg = decode_segments(locs, jnp.array([5.0, 1.0]), jnp.array([1.0, 100.0]), 8.0)
    np.testing.assert_allclose(np.asarray(seg), [[0.0, 3.0], [3.0, 8.0]])


@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_nms_matches_numpy_oracle(thresh):
    rng = np.random.default_rng(42)
    b, k = 4, 32
    start = rng.uniform(0, 50, (b, k)).astype(np.float32)
    length = rng.uniform(1, 30, (b, k)).astype(np.float32)
    segs = np.stack([start, start + length], -1)
    # distinct scores → unique, comparable ordering
    scores = rng.permutation(b * k).reshape(b, k).astype(np.float32)

    order, keep, sorted_segs = batched_temporal_nms(
        jnp.asarray(segs), jnp.asarray(scores), thresh
    )
    order, keep = np.asarray(order), np.asarray(keep)
    for i in range(b):
        want = np_nms(segs[i], scores[i], thresh)
        got = [order[i, j] for j in range(k) if keep[i, j]]
        assert got == want, f"batch {i}: {got} != {want}"
        np.testing.assert_allclose(
            np.asarray(sorted_segs)[i], segs[i][order[i]], atol=1e-6
        )


def test_recall_counts():
    # Two queries; K=3 candidates already in score order.
    segs = jnp.array(
        [
            [[0.0, 10.0], [20.0, 30.0], [0.0, 9.0]],
            [[50.0, 60.0], [0.0, 10.0], [0.0, 5.0]],
        ]
    )
    keep = jnp.array([[True, True, False], [True, True, True]])
    gt = jnp.array([[0.0, 10.0], [0.0, 10.0]])
    # query0: top1 IoU=1.0 → hit at all m. query1: top1 IoU=0 (kept), top2 IoU=1.
    out = recall_at_n(segs, keep, gt, ns=(1, 5), iou_thresholds=(0.5, 0.7))
    assert float(out[(1, 0.5)]) == 1.0
    assert float(out[(5, 0.5)]) == 2.0
    assert float(out[(1, 0.7)]) == 1.0
    assert float(out[(5, 0.7)]) == 2.0
    # valid mask drops query 1
    out = recall_at_n(segs, keep, gt, ns=(5,), iou_thresholds=(0.5,),
                      valid=jnp.array([True, False]))
    assert float(out[(5, 0.5)]) == 1.0


def test_recall_respects_nms_rank():
    # Suppressed candidate must not count toward top-1.
    segs = jnp.array([[[0.0, 10.0], [0.0, 10.0]]])
    keep = jnp.array([[False, True]])
    gt = jnp.array([[0.0, 10.0]])
    out = recall_at_n(segs, keep, gt, ns=(1,), iou_thresholds=(0.5,))
    assert float(out[(1, 0.5)]) == 1.0  # kept one ranks first among kept


def test_nms_deep_suppression_chain():
    """Adversarial chain for the fixpoint-iteration NMS: segment i overlaps
    only segment i+1, scores descend — so kept/suppressed alternate and the
    keep decision at rank i depends on rank i-1's, forcing the full
    dependency depth (the case a 'suppress by any higher-scored overlap'
    shortcut gets wrong)."""
    k = 24
    starts = np.arange(k, dtype=np.float32) * 4.0
    # length 10, stride 4: IoU(i, i+1) = 6/14 ≈ 0.43 > 0.3, but
    # IoU(i, i+2) = 2/18 ≈ 0.11 < 0.3 — only adjacent pairs interact.
    segs = np.stack([starts, starts + 10.0], -1)
    scores = np.arange(k, 0, -1, dtype=np.float32)
    order, keep, _ = batched_temporal_nms(
        jnp.asarray(segs[None]), jnp.asarray(scores[None]), 0.3
    )
    want = np_nms(segs, scores, 0.3)
    got = [int(order[0, j]) for j in range(k) if keep[0, j]]
    assert got == want
    # alternating pattern: evens kept, odds suppressed
    assert got == list(range(0, k, 2))


def test_miou_counts():
    from drn_tpu.ops.metrics import MIOU_KEY

    # query0 top-1 kept IoU = 1.0; query1 top-1 kept IoU = 0.0 (disjoint).
    segs = jnp.array(
        [
            [[0.0, 10.0], [20.0, 30.0]],
            [[50.0, 60.0], [0.0, 10.0]],
        ]
    )
    keep = jnp.array([[True, True], [True, True]])
    gt = jnp.array([[0.0, 10.0], [0.0, 10.0]])
    out = recall_at_n(segs, keep, gt, ns=(1,), iou_thresholds=(0.5,))
    assert float(out[MIOU_KEY]) == 1.0
    # suppressed top candidate: mIoU reads the first SURVIVOR
    keep2 = jnp.array([[False, True], [False, True]])
    out2 = recall_at_n(segs, keep2, gt, ns=(1,), iou_thresholds=(0.5,))
    # q0 survivor [20,30] iou 0; q1 survivor [0,10] iou 1
    assert float(out2[MIOU_KEY]) == 1.0
    # valid mask drops query 1
    out3 = recall_at_n(segs, keep, gt, ns=(1,), iou_thresholds=(0.5,),
                       valid=jnp.array([True, False]))
    assert float(out3[MIOU_KEY]) == 1.0
    out4 = recall_at_n(segs, keep, gt, ns=(1,), iou_thresholds=(0.5,),
                       valid=jnp.array([False, True]))
    assert float(out4[MIOU_KEY]) == 0.0

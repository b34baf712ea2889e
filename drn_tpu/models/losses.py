"""Dense target assignment and training losses (reference: `model/loss.py`).

All assignment logic is masked arithmetic over the flattened (B, N) location
grid — no boolean indexing, no dynamic shapes (SURVEY.md §8 "dense target
assignment under jit"):

  * positives: locations strictly inside the GT span whose max boundary
    distance falls in the level's range-of-interest (FCOS-style bucketing);
    if a GT span is too short to contain any location center, the nearest
    level-0 location is force-assigned so every query supervises something.
  * regression: -log tIoU(decoded segment, GT) on positives.
  * matching: sigmoid focal loss (alpha<0 degrades to plain BCE).
  * IoU head (stage 2): MSE between sigmoid(iou_logit) and the tIoU of the
    (stop-gradient) decoded segment vs GT, positives weighted above
    negatives — targets depend on the model's own regressions.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from drn_tpu.config import ModelConfig, TrainConfig
from drn_tpu.ops.temporal import decode_segments, temporal_iou


def assign_targets(
    cfg: ModelConfig,
    locations: jnp.ndarray,   # (N,) base-grid coords
    level_ids: jnp.ndarray,   # (N,) int32
    gt: jnp.ndarray,          # (B, 2) base-grid units
    base_len: int,
) -> jnp.ndarray:
    """Returns positives mask (B, N) bool."""
    gs, ge = gt[:, 0:1], gt[:, 1:2]                   # (B, 1)
    d_s = locations[None, :] - gs                     # (B, N)
    d_e = ge - locations[None, :]
    inside = (d_s > 0) & (d_e > 0)
    max_d = jnp.maximum(d_s, d_e) / float(base_len)
    ranges = jnp.asarray(cfg.level_ranges, jnp.float32)  # (L, 2)
    lo = ranges[level_ids, 0][None, :]
    hi = ranges[level_ids, 1][None, :]
    pos = inside & (max_d >= lo) & (max_d < hi)

    # Fallback: GT shorter than one cell → assign nearest level-0 location.
    has_pos = jnp.any(pos, axis=1, keepdims=True)
    center = 0.5 * (gs + ge)
    dist = jnp.abs(locations[None, :] - center)
    dist = jnp.where(level_ids[None, :] == 0, dist, jnp.inf)
    nearest = jnp.argmin(dist, axis=1)
    fallback = jnp.zeros_like(pos).at[jnp.arange(pos.shape[0]), nearest].set(True)
    return jnp.where(has_pos, pos, fallback)


def focal_bce(logits, targets, alpha: float, gamma: float):
    """Per-element sigmoid focal loss; alpha<0 → plain BCE."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    if alpha < 0:
        return ce
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


def drn_loss(
    cfg: ModelConfig,
    tcfg: TrainConfig,
    outputs: Dict[str, jnp.ndarray],
    locations: jnp.ndarray,
    level_ids: jnp.ndarray,
    gt: jnp.ndarray,
    base_len: int,
    valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss + per-term metrics. `gt` in base-grid units; `valid` (B,)
    masks padding rows in ragged final batches."""
    b, n = outputs["match_logits"].shape
    if valid is None:
        valid = jnp.ones((b,), bool)
    vrow = valid[:, None]

    pos = assign_targets(cfg, locations, level_ids, gt, base_len) & vrow
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    # Regression: -log tIoU on positives, on UNCLIPPED segments (see
    # decode_segments: clipping would zero the gradient exactly when the
    # regression overshoots the grid).
    segs = decode_segments(
        locations, outputs["d_start"], outputs["d_end"], float(base_len),
        clip=False,
    )
    iou = temporal_iou(segs, gt[:, None, :])  # (B, N)
    reg_loss = jnp.sum(-jnp.log(jnp.clip(iou, 1e-6, 1.0)) * pos) / num_pos

    # Matching: focal/BCE over all valid locations, normalized by #positives.
    m_loss = focal_bce(
        outputs["match_logits"], pos.astype(jnp.float32),
        tcfg.focal_alpha, tcfg.focal_gamma,
    )
    match_loss = jnp.sum(m_loss * vrow) / num_pos

    # IoU head: targets from the model's own (stop-gradient) regressions.
    iou_target = temporal_iou(outputs["segments"], gt[:, None, :])
    iou_pred = jax.nn.sigmoid(outputs["iou_logits"])
    w = jnp.where(pos, 1.0, 0.1) * vrow
    iou_loss = jnp.sum(w * (iou_pred - iou_target) ** 2) / jnp.maximum(
        jnp.sum(w), 1.0
    )

    stage2 = float(tcfg.stage >= 2)
    total = (
        tcfg.match_loss_weight * match_loss
        + tcfg.reg_loss_weight * reg_loss
        + stage2 * tcfg.iou_loss_weight * iou_loss
    )
    metrics = {
        "loss": total,
        "match_loss": match_loss,
        "reg_loss": reg_loss,
        "iou_loss": iou_loss,
        "num_pos": num_pos,
        "mean_pos_iou": jnp.sum(iou * pos) / num_pos,
    }
    return total, metrics

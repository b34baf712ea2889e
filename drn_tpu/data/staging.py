"""Device-resident feature staging (round 5).

Every headline q/s number is device-side with features pre-staged in
memory; the measured host pipeline on a small host feeds ~1k examples/s
from disk (operations.md §6) — a 59k q/s chip starves. The deployment
answer BASELINE.md names is a RAM/device-resident feature store, and this
module implements it: read each UNIQUE video once (grounding datasets
average several queries per video, so the read count drops by that
factor), stack the resampled grids into one (V, num_clips, F) table, put
it on device, and feed the step batches that carry only a `video_row`
index — the jitted step gathers `table[video_row]` in HBM (a contiguous
take along the leading axis; ~60 µs for a 50 MB batch at v5e bandwidth,
noise next to the ~0.8 ms step).

Table HBM cost is V·num_clips·F·4 bytes: Charades-STA test ≈ 1.3k videos
× 64 × 4096 fp32 ≈ 1.4 GB — comfortable in 16 GB; `stage_video_features`
prints the size so capacity surprises are loud.

Usage:
    table, view = stage_video_features(dataset)       # host, once
    jt = jnp.asarray(table)                           # or device_put
    eval_step(params, batch_from_view, table=jt)      # per batch
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


class StagedGroundingView:
    """GroundingDataset-compatible view whose rows carry `video_row`
    (int32 index into the staged table) instead of `features`. Works with
    BatchIterator / GrainBatchIterator unchanged (fixed shapes; padding
    rows get video_row 0 with valid=False, masked like any padding)."""

    def __init__(self, base, row_of: Dict[str, int],
                 t_raw_of: Dict[str, int]):
        self.base = base
        self.row_of = row_of
        self.t_raw_of = t_raw_of

    def __len__(self):
        return len(self.base)

    def __repr__(self):
        # Grain pins repr(data_source) in iterator checkpoints, same as
        # the base dataset (datasets.py) — keep it address-free.
        return f"StagedGroundingView({self.base!r})"

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        vid = self.base.examples[i].video_id
        row = self.base.annotation_row(i, self.t_raw_of[vid])
        row["video_row"] = np.int32(self.row_of[vid])
        return row


def stage_video_features(dataset) -> Tuple[np.ndarray, StagedGroundingView]:
    """Read each unique video once → ((V, num_clips, F) float32 table,
    feature-free view of `dataset` indexing into it). Order of first
    appearance, so repeated stagings of one dataset are deterministic."""
    vids = list(dict.fromkeys(ex.video_id for ex in dataset.examples))
    # Preallocate and fill in place — stacking a list of grids would
    # transiently double the table's host footprint.
    table = np.zeros((max(len(vids), 1), dataset.cfg.num_clips,
                      dataset.mcfg.feature_dim), np.float32)
    row_of: Dict[str, int] = {}
    t_raw_of: Dict[str, int] = {}
    for r, vid in enumerate(vids):
        feats, t_raw = dataset.read_features(vid)
        table[r] = feats
        row_of[vid] = r
        t_raw_of[vid] = t_raw
    print(f"[staging] {len(vids)} unique videos for "
          f"{len(dataset)} examples → feature table "
          f"{table.shape} ({table.nbytes / 1e9:.2f} GB)", flush=True)
    return table, StagedGroundingView(dataset, row_of, t_raw_of)

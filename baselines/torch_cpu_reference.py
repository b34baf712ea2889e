"""PyTorch-CPU baseline for the throughput comparison.

BASELINE.md's binding speed target is ">= 20x queries/sec over the PyTorch
CPU reference on one v5e chip", but the reference mount is empty (SURVEY.md
§0), so this is an *independent* PyTorch implementation of the same
architecture (SURVEY.md §3: GloVe+BiLSTM query encoder, 1D-conv backbone,
Hadamard fusion + conv per pyramid level, top-down FPN, dense loc/match/IoU
heads, per-query serial NumPy NMS) with matched dimensions, used to measure
a representative CPU queries/sec. It is NOT a port of reference code — the
reference contains zero files to port.
"""

from __future__ import annotations

import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchDRN(nn.Module):
    def __init__(self, feature_dim=4096, hidden=512, embed=300, vocab=8000,
                 num_levels=3, lstm_layers=3, k=3):
        super().__init__()
        self.num_levels = num_levels
        self.embed = nn.Embedding(vocab, embed)
        self.lstm = nn.LSTM(embed, hidden // 2, num_layers=lstm_layers,
                            bidirectional=True, batch_first=True)
        self.q_proj = nn.ModuleList(
            [nn.Linear(hidden, hidden) for _ in range(num_levels)]
        )
        self.stem = nn.Conv1d(feature_dim, hidden, k, padding=k // 2)
        self.down = nn.ModuleList(
            [nn.Conv1d(hidden, hidden, k, 2, padding=k // 2)
             for _ in range(num_levels - 1)]
        )
        self.fuse = nn.ModuleList(
            [nn.Conv1d(hidden, hidden, k, padding=k // 2)
             for _ in range(num_levels)]
        )
        self.lat = nn.ModuleList(
            [nn.Conv1d(hidden, hidden, 1) for _ in range(num_levels)]
        )
        self.loc_tower = nn.Sequential(
            nn.Conv1d(hidden, hidden, k, padding=k // 2), nn.ReLU(),
            nn.Conv1d(hidden, hidden, k, padding=k // 2), nn.ReLU(),
        )
        self.match_tower = nn.Sequential(
            nn.Conv1d(hidden, hidden, k, padding=k // 2), nn.ReLU(),
            nn.Conv1d(hidden, hidden, k, padding=k // 2), nn.ReLU(),
        )
        self.loc_head = nn.Conv1d(hidden, 2, k, padding=k // 2)
        self.match_head = nn.Conv1d(hidden, 1, k, padding=k // 2)
        self.iou_head = nn.Sequential(
            nn.Conv1d(hidden, hidden, 1), nn.ReLU(), nn.Conv1d(hidden, 1, 1)
        )

    @torch.no_grad()
    def forward(self, feats, word_ids):
        # feats (B, T, F), word_ids (B, L)
        e = self.embed(word_ids)
        h, _ = self.lstm(e)
        q = h[:, -1]  # (B, H)
        v = F.relu(self.stem(feats.transpose(1, 2)))  # (B, H, T)
        levels = [v]
        for d in self.down:
            levels.append(F.relu(d(levels[-1])))
        fused = [
            F.relu(self.fuse[i](levels[i] * self.q_proj[i](q).unsqueeze(-1)))
            for i in range(self.num_levels)
        ]
        pyr = [self.lat[-1](fused[-1])]
        for i in range(self.num_levels - 2, -1, -1):
            up = F.interpolate(pyr[0], scale_factor=2, mode="nearest")
            pyr.insert(0, self.lat[i](fused[i]) + up)
        outs = []
        for i, p in enumerate(pyr):
            lt = self.loc_tower(p)
            mt = self.match_tower(p)
            d = F.softplus(self.loc_head(lt)) * (2 ** i)  # grid units
            m = self.match_head(mt)[:, 0]
            iou = self.iou_head(mt)[:, 0]
            t = p.shape[-1]
            locs = (torch.arange(t, dtype=torch.float32) + 0.5) * (2 ** i)
            seg = torch.stack([locs - d[:, 0], locs + d[:, 1]], dim=-1)
            outs.append((seg, torch.sigmoid(m) * torch.sigmoid(iou)))
        segs = torch.cat([s for s, _ in outs], dim=1)
        scores = torch.cat([sc for _, sc in outs], dim=1)
        return segs, scores


def nms_numpy(segs: np.ndarray, scores: np.ndarray, thresh=0.5, top_k=48):
    """Serial per-query temporal NMS — the reference's post-processing style."""
    order = np.argsort(-scores)[:top_k]
    segs, scores = segs[order], scores[order]
    keep = []
    sup = np.zeros(len(segs), bool)
    for i in range(len(segs)):
        if sup[i]:
            continue
        keep.append(i)
        s, e = segs[i]
        os = np.maximum(segs[i + 1:, 0], s)
        oe = np.minimum(segs[i + 1:, 1], e)
        inter = np.clip(oe - os, 0, None)
        union = (e - s) + (segs[i + 1:, 1] - segs[i + 1:, 0]) - inter
        iou = inter / np.maximum(union, 1e-6)
        sup[i + 1:] |= iou > thresh
    return segs[keep], scores[keep]


def measure_qps(n_queries=64, batch_size=16, feature_dim=4096, t=64, l=20,
                seed=0) -> float:
    torch.manual_seed(seed)
    model = TorchDRN(feature_dim=feature_dim).eval()
    rng = np.random.default_rng(seed)
    feats = torch.from_numpy(
        rng.normal(size=(n_queries, t, feature_dim)).astype(np.float32)
    )
    words = torch.from_numpy(rng.integers(2, 8000, (n_queries, l)))
    # warmup
    model(feats[:batch_size], words[:batch_size])
    t0 = time.perf_counter()
    for off in range(0, n_queries, batch_size):
        segs, scores = model(feats[off:off + batch_size],
                             words[off:off + batch_size])
        sn, sc = segs.numpy(), scores.numpy()
        for b in range(sn.shape[0]):
            nms_numpy(sn[b], sc[b])
    dt = time.perf_counter() - t0
    return n_queries / dt


if __name__ == "__main__":
    print(f"torch-cpu qps: {measure_qps():.2f}")

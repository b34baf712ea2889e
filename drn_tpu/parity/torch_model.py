"""PyTorch twin of the flax DRN — the weight-conversion schema.

Architecturally identical to `drn_tpu.models.DRN` (op-for-op, including
XLA-style SAME padding and masked-BiLSTM semantics), so a weight transfer
via `convert.torch_state_to_flax` must reproduce activations to float
tolerance — verified in tests/test_parity.py. Runs in float32 on CPU;
performance is irrelevant here.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from drn_tpu.config import ModelConfig

_EPS = 1e-6  # flax LayerNorm default


def same_pad_conv(x: torch.Tensor, conv: nn.Conv1d, stride: int) -> torch.Tensor:
    """XLA SAME padding: out = ceil(T/stride), pad split low-side-first.

    x: (B, T, C) -> (B, T_out, C_out). Matches
    `lax.conv_general_dilated(..., padding='SAME')` exactly (for stride 2 the
    pad is asymmetric: left 0 / right 1 for k=3 even T, which torch's
    symmetric `padding=` cannot express).
    """
    k = conv.kernel_size[0]
    t = x.shape[1]
    out_len = -(-t // stride)
    pad_total = max((out_len - 1) * stride + k - t, 0)
    lo = pad_total // 2
    xt = F.pad(x.transpose(1, 2), (lo, pad_total - lo))
    return conv(xt).transpose(1, 2)


class TConvBlock(nn.Module):
    """Conv1d(+LayerNorm,+ReLU) on (B, T, C) — twin of models.layers.ConvBlock."""

    def __init__(self, in_c: int, out_c: int, k: int = 3, stride: int = 1,
                 use_norm: bool = True, use_act: bool = True):
        super().__init__()
        self.conv = nn.Conv1d(in_c, out_c, k, stride)
        self.norm = nn.LayerNorm(out_c, eps=_EPS) if use_norm else None
        self.use_act = use_act
        self.stride = stride

    def forward(self, x):
        x = same_pad_conv(x, self.conv, self.stride)
        if self.norm is not None:
            x = self.norm(x)
        return F.relu(x) if self.use_act else x


def masked_reverse(x: torch.Tensor, lengths: torch.Tensor) -> torch.Tensor:
    """Flip each sequence's first `lengths[b]` steps in place (tail kept).

    Twin of flax `nn.RNN(reverse=True, keep_order=True, seq_lengths=...)`
    input/output flipping.
    """
    b, l, _ = x.shape
    idx = torch.arange(l)[None, :].expand(b, l)
    rev = lengths[:, None] - 1 - idx
    rev = torch.where(idx < lengths[:, None], rev, idx)
    return torch.gather(x, 1, rev[..., None].expand_as(x))


class TorchDRNParity(nn.Module):
    def __init__(self, cfg: ModelConfig, base_len: int):
        super().__init__()
        self.cfg = cfg
        self.base_len = base_len
        d, half = cfg.hidden_dim, cfg.hidden_dim // 2
        nl = cfg.num_levels

        # --- query encoder ---
        self.embed = nn.Embedding(cfg.vocab_size, cfg.embed_dim)
        in_dims = [cfg.embed_dim] + [d] * (cfg.num_lstm_layers - 1)
        self.lstm_fwd = nn.ModuleList(
            [nn.LSTM(i, half, batch_first=True) for i in in_dims]
        )
        self.lstm_bwd = nn.ModuleList(
            [nn.LSTM(i, half, batch_first=True) for i in in_dims]
        )
        self.query_proj = nn.ModuleList([nn.Linear(d, d) for _ in range(nl)])

        # --- backbone ---
        self.input_norm = nn.LayerNorm(cfg.feature_dim, eps=_EPS)
        self.stem = TConvBlock(cfg.feature_dim, d, 3)
        self.levels = nn.ModuleList(
            [TConvBlock(d, d, 3, stride=1 if l == 0 else 2) for l in range(nl)]
        )

        # --- fusion (conv owned bare, LN separate — mirrors CrossModalFusion) ---
        self.fusion_conv = nn.ModuleList(
            [nn.Conv1d(d, d, cfg.fusion_kernel_size) for _ in range(nl)]
        )
        self.fusion_norm = nn.ModuleList(
            [nn.LayerNorm(d, eps=_EPS) for _ in range(nl)]
        )

        # --- FPN ---
        self.lateral = nn.ModuleList(
            [TConvBlock(d, d, 1, use_act=False) for _ in range(nl)]
        )
        self.smooth = nn.ModuleList([TConvBlock(d, d, 3) for _ in range(nl)])

        # --- heads (towers shared across levels) ---
        tower = lambda: nn.ModuleList(
            [TConvBlock(d, d, 3) for _ in range(cfg.head_tower_layers)]
        )
        self.loc_tower, self.match_tower = tower(), tower()
        self.loc_out = nn.Conv1d(d, 2, 3)
        self.match_out = nn.Conv1d(d, 1, 3)
        self.scales = nn.Parameter(torch.ones(nl))

        # --- IoU head ---
        mix_in = [3 * d] + [d] * (cfg.iou_head_layers - 1)
        self.iou_mix = nn.ModuleList(
            [TConvBlock(mix_in[i], d, 1) for i in range(cfg.iou_head_layers)]
        )
        self.iou_out = nn.Conv1d(d, 1, 1)

    # -- pieces --------------------------------------------------------

    def encode_query(self, word_ids, query_mask):
        x = self.embed(word_ids)
        lengths = query_mask.long().sum(-1).clamp(min=1)
        outs: List[torch.Tensor] = []
        h = x
        for i in range(self.cfg.num_lstm_layers):
            f, _ = self.lstm_fwd[i](h)
            rb, _ = self.lstm_bwd[i](masked_reverse(h, lengths))
            b = masked_reverse(rb, lengths)
            h = torch.cat([f, b], dim=-1)
            outs.append(h)
        mask_f = query_mask[..., None].float()
        denom = mask_f.sum(1).clamp(min=1.0)
        queries = []
        for level in range(self.cfg.num_levels):
            src = outs[min(level, self.cfg.num_lstm_layers - 1)]
            pooled = (src * mask_f).sum(1) / denom
            queries.append(torch.tanh(self.query_proj[level](pooled)))
        return queries

    @staticmethod
    def _time_sample(feat: torch.Tensor, pos: torch.Tensor) -> torch.Tensor:
        t = feat.shape[1]
        pos = pos.clamp(0.0, t - 1.0)
        lo = pos.floor().long()
        hi = (lo + 1).clamp(max=t - 1)
        w = (pos - lo.float())[..., None]
        d = feat.shape[-1]
        f_lo = torch.gather(feat, 1, lo[..., None].expand(-1, -1, d))
        f_hi = torch.gather(feat, 1, hi[..., None].expand(-1, -1, d))
        return f_lo * (1.0 - w) + f_hi * w

    # -- forward -------------------------------------------------------

    @torch.no_grad()
    def forward(self, features, word_ids, query_mask) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        queries = self.encode_query(word_ids, query_mask)

        v = self.input_norm(features)
        v = self.stem(v)
        v_levels = []
        for blk in self.levels:
            v = blk(v)
            v_levels.append(v)

        fused = []
        for l in range(cfg.num_levels):
            x = v_levels[l] * queries[l][:, None, :]
            xt = F.pad(x.transpose(1, 2),
                       (cfg.fusion_kernel_size // 2,) * 2)
            y = self.fusion_conv[l](xt).transpose(1, 2)
            fused.append(F.relu(self.fusion_norm[l](y)))

        laterals = [self.lateral[l](fused[l]) for l in range(cfg.num_levels)]
        outs: List[torch.Tensor] = [None] * cfg.num_levels  # type: ignore
        outs[-1] = laterals[-1]
        for l in range(cfg.num_levels - 2, -1, -1):
            outs[l] = laterals[l] + outs[l + 1].repeat_interleave(2, dim=1)
        pyramid = [self.smooth[l](outs[l]) for l in range(cfg.num_levels)]

        d_start, d_end, match_logits, iou_logits, segments = [], [], [], [], []
        for l, feat in enumerate(pyramid):
            stride = float(2 ** l)
            lt = feat
            for blk in self.loc_tower:
                lt = blk(lt)
            raw = same_pad_conv(lt, self.loc_out, 1)
            c = 8.0  # soft-capped exponent — mirrors flax heads.py
            dists = torch.exp(c * torch.tanh(self.scales[l] * raw / c)) * stride
            mt = feat
            for blk in self.match_tower:
                mt = blk(mt)
            m = same_pad_conv(mt, self.match_out, 1)[..., 0]

            t_l = feat.shape[1]
            locs = (torch.arange(t_l).float() + 0.5) * stride
            start = (locs - dists[..., 0]).clamp(0.0, self.base_len)
            end = (locs + dists[..., 1]).clamp(0.0, self.base_len)
            end = torch.maximum(end, start)
            seg = torch.stack([start, end], dim=-1)

            mid = 0.5 * (start + end)
            to_idx = lambda p: p / stride - 0.5
            sampled = torch.cat(
                [self._time_sample(feat, to_idx(p)) for p in (start, mid, end)],
                dim=-1,
            )
            x = sampled
            for blk in self.iou_mix:
                x = blk(x)
            iou = same_pad_conv(x, self.iou_out, 1)[..., 0]

            d_start.append(dists[..., 0])
            d_end.append(dists[..., 1])
            match_logits.append(m)
            iou_logits.append(iou)
            segments.append(seg)

        cat = lambda xs: torch.cat(xs, dim=1).numpy()
        return {
            "d_start": cat(d_start),
            "d_end": cat(d_end),
            "match_logits": cat(match_logits),
            "iou_logits": cat(iou_logits),
            "segments": cat(segments),
            # intermediates for per-layer comparison
            "_queries": [q.numpy() for q in queries],
            "_backbone": [v.numpy() for v in v_levels],
            "_fused": [f.numpy() for f in fused],
            "_pyramid": [p.numpy() for p in pyramid],
        }

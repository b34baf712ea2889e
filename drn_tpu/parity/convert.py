"""torch state_dict → flax params pytree (SURVEY.md §6 "Checkpoint/resume":
the torch→flax weight-conversion tool for parity testing).

Input is a state_dict in the `TorchDRNParity` schema (see package docstring:
a real reference checkpoint is first renamed onto that schema). Layout
transposes:

  * Conv1d weight (C_out, C_in, K)  → flax Conv kernel (K, C_in, C_out)
  * Linear weight (C_out, C_in)     → flax Dense kernel (C_in, C_out)
  * LSTM weight_ih_l0 (4H, In), gate rows ordered [i, f, g, o] (torch docs)
    → flax OptimizedLSTMCell {ii,if,ig,io}.kernel (In, H); weight_hh_l0 →
    {hi,hf,hg,ho}.kernel (H, H) with bias = bias_ih + bias_hh per gate
    (flax puts the single bias on the hidden-side Dense).
  * LayerNorm weight/bias → scale/bias.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from drn_tpu.config import ModelConfig

_GATES = ("i", "f", "g", "o")


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def _conv(sd, name: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{name}.weight"]).transpose(2, 1, 0),
        "bias": _np(sd[f"{name}.bias"]),
    }


def _dense(sd, name: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{name}.weight"]).T,
        "bias": _np(sd[f"{name}.bias"]),
    }


def _ln(sd, name: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{name}.weight"]),
        "bias": _np(sd[f"{name}.bias"]),
    }


def _conv_block(sd, name: str, norm: bool = True) -> Dict[str, Any]:
    out: Dict[str, Any] = {"Conv_0": _conv(sd, f"{name}.conv")}
    if norm:
        out["LayerNorm_0"] = _ln(sd, f"{name}.norm")
    return out


def _lstm_cell(sd, name: str, hidden: int) -> Dict[str, Any]:
    w_ih, w_hh = _np(sd[f"{name}.weight_ih_l0"]), _np(sd[f"{name}.weight_hh_l0"])
    b = _np(sd[f"{name}.bias_ih_l0"]) + _np(sd[f"{name}.bias_hh_l0"])
    cell: Dict[str, Any] = {}
    for gi, g in enumerate(_GATES):
        rows = slice(gi * hidden, (gi + 1) * hidden)
        cell[f"i{g}"] = {"kernel": w_ih[rows].T}
        cell[f"h{g}"] = {"kernel": w_hh[rows].T, "bias": b[rows]}
    return cell


def torch_state_to_flax(state_dict, cfg: ModelConfig) -> Dict[str, Any]:
    """Returns {"params": ...} matching `DRN.init`'s tree exactly."""
    sd = state_dict
    half = cfg.hidden_dim // 2

    qe: Dict[str, Any] = {
        "embedding": {"embedding": _np(sd["embed.weight"])},
    }
    for i in range(cfg.num_lstm_layers):
        qe[f"OptimizedLSTMCell_{2 * i}"] = _lstm_cell(sd, f"lstm_fwd.{i}", half)
        qe[f"OptimizedLSTMCell_{2 * i + 1}"] = _lstm_cell(sd, f"lstm_bwd.{i}", half)
    for l in range(cfg.num_levels):
        qe[f"query_proj_{l}"] = _dense(sd, f"query_proj.{l}")

    backbone: Dict[str, Any] = {
        "input_norm": _ln(sd, "input_norm"),
        "stem": _conv_block(sd, "stem"),
    }
    for l in range(cfg.num_levels):
        backbone[f"level_{l}"] = _conv_block(sd, f"levels.{l}")

    params: Dict[str, Any] = {"query_encoder": qe, "backbone": backbone}

    for l in range(cfg.num_levels):
        fc = _conv(sd, f"fusion_conv.{l}")
        params[f"fusion_{l}"] = {
            "kernel": fc["kernel"],
            "bias": fc["bias"],
            "LayerNorm_0": _ln(sd, f"fusion_norm.{l}"),
        }

    fpn: Dict[str, Any] = {}
    for l in range(cfg.num_levels):
        fpn[f"lateral_{l}"] = _conv_block(sd, f"lateral.{l}")
        fpn[f"smooth_{l}"] = _conv_block(sd, f"smooth.{l}")
    params["fpn"] = fpn

    heads: Dict[str, Any] = {
        "loc": {"out": _conv(sd, "loc_out")},
        "match": {"out": _conv(sd, "match_out")},
    }
    for i in range(cfg.head_tower_layers):
        heads["loc"][f"tower_{i}"] = _conv_block(sd, f"loc_tower.{i}")
        heads["match"][f"tower_{i}"] = _conv_block(sd, f"match_tower.{i}")
    scales = _np(sd["scales"])
    for l in range(cfg.num_levels):
        heads[f"scale_{l}"] = np.asarray(scales[l], np.float32)
    params["heads"] = heads

    iou: Dict[str, Any] = {"out": _conv(sd, "iou_out")}
    for i in range(cfg.iou_head_layers):
        iou[f"mix_{i}"] = _conv_block(sd, f"iou_mix.{i}")
    params["iou_head"] = iou

    return {"params": params}


def load_torch_checkpoint(path: str, cfg: ModelConfig) -> Dict[str, Any]:
    """Load a .pth checkpoint (raw state_dict or {'model': state_dict} as the
    reference saves — SURVEY.md §3 'Checkpointing') → flax params."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    # Unwrap explicitly: a wrapper checkpoint has a dict under "model"
    # (heuristics over the first value misfire on e.g. {"best_score":
    # tensor, "model": {...}} and raise on empty dicts).
    sd = (obj["model"]
          if isinstance(obj, dict) and isinstance(obj.get("model"), dict)
          else obj)
    return torch_state_to_flax(sd, cfg)


def main(argv=None):
    """One-time migration for reference users: .pth → native Orbax checkpoint
    usable by evaluate.py / infer.py / train.py --init-from.

        python -m drn_tpu.parity.convert --config charades_c3d \\
            --torch-checkpoint model_best.pth --out /ckpt/charades_stage1
    """
    import argparse

    p = argparse.ArgumentParser(
        description="Convert a parity-schema .pth into an Orbax checkpoint"
    )
    p.add_argument("--config", default="charades_c3d")
    p.add_argument("--torch-checkpoint", required=True)
    p.add_argument("--out", required=True, help="Orbax checkpoint directory")
    args = p.parse_args(argv)

    import jax

    from drn_tpu.config import get_config
    from drn_tpu.utils.checkpoint import CheckpointManager

    cfg = get_config(args.config)
    params = load_torch_checkpoint(args.torch_checkpoint, cfg.model)
    ckpt = CheckpointManager(args.out)
    ckpt.save(0, {"params": params}, force=True)
    ckpt.wait()
    ckpt.close()
    print(f"wrote Orbax checkpoint: {args.out} (step 0, "
          f"{len(jax.tree.leaves(params))} arrays)")


if __name__ == "__main__":
    main()

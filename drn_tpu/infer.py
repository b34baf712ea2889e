"""Single-query inference CLI (BASELINE config 1: "single-query inference
with reference checkpoint").

    python -m drn_tpu.infer --config charades_c3d \
        --checkpoint-dir /ckpt/charades_c3d/stage2 \
        --features /data/c3d/VID123.npy --duration 31.2 \
        --query "person opens the door"

Accepts either a native Orbax checkpoint (--checkpoint-dir) or a PyTorch
checkpoint in the parity schema (--torch-checkpoint, converted on the fly
via drn_tpu.parity). Prints the top segments in seconds with scores.
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def load_features(path: str, video_id: str = "") -> np.ndarray:
    if path.endswith((".h5", ".hdf5")):
        # One reader for every archive layout (incl. the public
        # ActivityNet nested groups) — data/features.py is the only
        # place HDF5 structure is interpreted.
        from drn_tpu.data.features import FeatureReader

        return FeatureReader(path).read(video_id)
    return np.load(path)


def main(argv=None):
    p = argparse.ArgumentParser(description="drn_tpu single-query inference")
    p.add_argument("--config", default="charades_c3d")
    p.add_argument("--checkpoint-dir", default=None,
                   help="Orbax checkpoint directory")
    p.add_argument("--torch-checkpoint", default=None,
                   help=".pth in the parity schema (drn_tpu/parity)")
    p.add_argument("--features", required=True,
                   help="per-video .npy, or .h5 with --video-id")
    p.add_argument("--video-id", default="")
    p.add_argument("--query", required=True, action="append",
                   help="sentence; repeat for multiple queries")
    p.add_argument("--duration", type=float, default=0.0,
                   help="video duration in seconds (default: raw feature "
                        "rows / --feature-fps)")
    p.add_argument("--feature-fps", type=float, default=None,
                   help="feature rows per second (duration fallback)")
    p.add_argument("--glove-path", default=None)
    p.add_argument("--annotation-path", default=None,
                   help="needed in GloVe mode so the (dataset-filtered) "
                        "vocab matches the one the checkpoint was trained "
                        "with")
    p.add_argument("--top", type=int, default=5)
    p.add_argument("--allow-config-mismatch", action="store_true",
                   help="downgrade the checkpoint-vs-active config parity "
                        "check to a warning")
    args = p.parse_args(argv)
    if not args.checkpoint_dir and not args.torch_checkpoint:
        p.error("one of --checkpoint-dir / --torch-checkpoint is required")

    import jax

    from drn_tpu.utils import enable_jit_cache

    enable_jit_cache()
    from drn_tpu.config import get_config
    from drn_tpu.data.features import (effective_feature_fps,
                                       resample_features)
    from drn_tpu.data.vocab import tokenize
    from drn_tpu.evaluate import predict
    from drn_tpu.train import build_model, init_params

    cfg = get_config(args.config)
    da = {}
    if args.glove_path:
        da["glove_path"] = args.glove_path
    if args.annotation_path:
        da["annotation_path"] = args.annotation_path
    if args.feature_fps is not None:
        da["feature_fps"] = args.feature_fps
    if da:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **da))

    raw = load_features(args.features, args.video_id)
    feats = resample_features(raw, cfg.data.num_clips)
    duration = (args.duration if args.duration > 0
                else float(raw.shape[0])
                / effective_feature_fps(cfg.data.feature_fps))

    from drn_tpu.data.pipeline import build_vocab

    vocab = build_vocab(cfg.data, cfg.model)
    ids, masks = zip(*(
        vocab.encode(tokenize(q, cfg.data.lowercase), cfg.data.max_query_len)
        for q in args.query
    ))
    n = len(args.query)

    model = build_model(cfg, pretrained_embeddings=vocab.embeddings)
    if args.torch_checkpoint:
        from drn_tpu.parity.convert import load_torch_checkpoint

        params = load_torch_checkpoint(args.torch_checkpoint, cfg.model)
    else:
        from drn_tpu.utils.checkpoint import (CheckpointManager,
                                              check_experiment_config,
                                              prefer_best_dir)

        check_experiment_config(
            args.checkpoint_dir, cfg,
            allow_mismatch=args.allow_config_mismatch, context="infer")
        template = init_params(cfg, model, jax.random.key(0))
        ckpt = CheckpointManager(prefer_best_dir(args.checkpoint_dir))
        restored = ckpt.restore({"params": template}, partial=True)
        if restored is None:
            raise FileNotFoundError(
                f"no checkpoint in {args.checkpoint_dir}")
        params = restored["params"]

    batch = {
        "features": np.tile(feats[None], (n, 1, 1)),
        "word_ids": np.stack(ids),
        "query_mask": np.stack(masks),
        "duration": np.full((n,), duration, np.float32),
    }
    segs_sec, keep, scores = predict(cfg, model, params, batch)

    for qi, q in enumerate(args.query):
        print(f"query: {q!r}")
        shown = 0
        for k in range(segs_sec.shape[1]):
            if not keep[qi, k]:
                continue
            s, e = segs_sec[qi, k]
            print(f"  {shown + 1}. [{s:7.2f}s, {e:7.2f}s]  "
                  f"score={scores[qi, k]:.4f}")
            shown += 1
            if shown >= args.top:
                break


if __name__ == "__main__":
    main()

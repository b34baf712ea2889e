"""Honest end-to-end eval: streaming host reads vs the device-resident
feature store (drn_tpu/data/staging.py, round 5).

operations.md §6 measured the host pipeline at ~1k examples/s on this
1-vCPU host — 1.8% of the device-only eval rate. The staged path reads
each UNIQUE video once, keeps the grids in HBM, and feeds the eval loop
only word ids + row indices; this probe measures what that buys as
WALL-CLOCK `evaluate()` time (dispatch, host batching, metric fetch —
everything a user waits for) on an on-disk corpus at flagship dims.

    python scripts/staged_eval_probe.py --videos 512 --queries-per-video 8

Rows: streaming epoch (cold + warm page cache), staging pass, staged
epochs. The honest rates to quote are warm-streaming vs staged-epoch;
staging amortizes after ~one epoch (it does the same reads a streaming
epoch does, minus the per-example repeats).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from host_pipeline_probe import build_corpus  # noqa: E402  (same corpus)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="streaming vs staged eval")
    p.add_argument("--out", default="/tmp/drn_staged_corpus")
    p.add_argument("--videos", type=int, default=512)
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--rows", default="96,160")
    p.add_argument("--queries-per-video", type=int, default=8)
    p.add_argument("--config", default="charades_c3d")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke mode)")
    p.add_argument("--epochs", type=int, default=2,
                   help="staged eval repetitions (post-staging)")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np  # noqa: F401

    from drn_tpu.config import get_config
    from drn_tpu.data.pipeline import make_dataset
    from drn_tpu.data.staging import stage_video_features
    from drn_tpu.evaluate import evaluate, get_eval_step
    from drn_tpu.train import build_model, init_params
    from drn_tpu.utils import enable_jit_cache

    enable_jit_cache()
    rows_lo, rows_hi = (int(x) for x in args.rows.split(","))
    t0 = time.time()
    stats = build_corpus(args.out, args.videos, args.dim, rows_lo, rows_hi,
                         args.queries_per_video)
    print(f"[probe +{time.time() - t0:5.1f}s] corpus: {stats['examples']} "
          f"examples / {args.videos} videos, {stats['raw_gb']:.2f} GB",
          file=sys.stderr, flush=True)

    cfg = get_config(args.config)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="charades",  # the corpus builder's format
            feature_dir=stats["feature_dir"],
            annotation_path=os.path.join(args.out,
                                         "charades_sta_{split}.txt"),
            feature_fps=2.0),
        model=dataclasses.replace(cfg.model, feature_dim=args.dim),
    )
    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))

    results = []

    def timed(tag, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        row = {"phase": tag, "seconds": round(dt, 2),
               "examples_per_s": round(stats["examples"] / dt, 1)}
        results.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
        return out

    # Warm BOTH compiles outside the timed rows with zeros (no file
    # reads, so the streaming-cold row still measures a cold page cache;
    # the staged warmup uses a zeros table at the REAL (V, T, F) shape —
    # a different table shape would recompile inside a timed epoch).
    import jax.numpy as jnp

    step = get_eval_step(cfg, model)
    jb = {
        "video_row": jnp.zeros((cfg.eval.batch_size,), jnp.int32),
        "word_ids": jnp.zeros((cfg.eval.batch_size,
                               cfg.data.max_query_len), jnp.int32),
        "query_mask": jnp.ones((cfg.eval.batch_size,
                                cfg.data.max_query_len), bool),
        "gt_grid": jnp.tile(jnp.asarray([0.0, 1.0]),
                            (cfg.eval.batch_size, 1)),
        "duration": jnp.ones((cfg.eval.batch_size,), jnp.float32),
        "valid": jnp.ones((cfg.eval.batch_size,), bool),
    }
    zeros_table = jnp.zeros((args.videos, cfg.data.num_clips, args.dim),
                            jnp.float32)
    jax.block_until_ready(step(params, jb, zeros_table))
    del zeros_table
    jb2 = dict(jb)
    jb2.pop("video_row")
    jb2["features"] = jnp.zeros((cfg.eval.batch_size, cfg.data.num_clips,
                                 args.dim), jnp.float32)
    jax.block_until_ready(step(params, jb2))
    print("[probe] compiles warm", file=sys.stderr, flush=True)

    # Streaming: cold then warm page cache (fresh dataset per epoch so the
    # per-video LRU does its normal job; the corpus groups queries).
    ds = make_dataset(cfg.data, cfg.model, split="train")
    m_cold = timed("streaming_epoch_cold",
                   lambda: evaluate(cfg, model, params, dataset=ds,
                                    split="train"))
    m_warm = timed("streaming_epoch_warm",
                   lambda: evaluate(cfg, model, params, dataset=ds,
                                    split="train"))
    assert m_cold == m_warm

    # Staged: one staging pass, then feature-read-free epochs.
    ds2 = make_dataset(cfg.data, cfg.model, split="train")
    table, view = timed("staging_pass",
                        lambda: stage_video_features(ds2))
    table_dev = jnp.asarray(table)
    m_staged = None
    for e in range(args.epochs):
        m_staged = timed(
            f"staged_epoch_{e}",
            lambda: _staged_epoch(cfg, model, params, view, table_dev))
    # Bit-identity is pinned on CPU (tests/test_staging.py); on TPU the
    # gather could in principle reorder bf16 fusion — report, don't die.
    metrics_match = m_staged == m_warm
    if not metrics_match:
        diffs = {k: (m_warm[k], m_staged[k]) for k in m_warm
                 if m_warm[k] != m_staged.get(k)}
        print(f"[probe] staged metrics differ from streaming: {diffs}",
              file=sys.stderr, flush=True)

    warm = next(r for r in results if r["phase"] == "streaming_epoch_warm")
    staged = [r for r in results if r["phase"].startswith("staged_epoch")]
    best_staged = max(staged, key=lambda r: r["examples_per_s"])
    print(json.dumps({
        "probe": "staged_eval",
        "backend": jax.default_backend(),
        "corpus_examples": stats["examples"],
        "unique_videos": args.videos,
        "table_gb": round(args.videos * cfg.data.num_clips * args.dim
                          * 4 / 1e9, 2),
        "streaming_warm": warm,
        "staged_best": best_staged,
        "staged_speedup": round(
            best_staged["examples_per_s"] / warm["examples_per_s"], 1),
        "metrics_match": metrics_match,
        "results": results,
    }))
    return 0


def _staged_epoch(cfg, model, params, view, table_dev):
    """evaluate()'s loop over a pre-staged table (evaluate() itself would
    re-stage per call — the probe times the epochs separately)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from drn_tpu.data.pipeline import make_batch_iterator
    from drn_tpu.evaluate import get_eval_step
    from drn_tpu.ops.metrics import metric_name

    step = get_eval_step(cfg, model)
    batches = make_batch_iterator(
        view, _dc.replace(cfg.data, batch_size=cfg.eval.batch_size),
        shuffle=False, seed=0)
    totals, n_total = None, None
    for batch in batches.epoch(0):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        counts, n_valid, *_ = step(params, jb, table_dev)
        if totals is None:
            totals, n_total = counts, n_valid
        else:
            totals = {k: totals[k] + v for k, v in counts.items()}
            n_total = n_total + n_valid
    totals = {k: float(v) for k, v in jax.device_get(totals).items()}
    n = float(n_total)
    return {metric_name(k): 100.0 * v / max(n, 1.0)
            for k, v in sorted(totals.items(), key=str)}


if __name__ == "__main__":
    sys.exit(main())

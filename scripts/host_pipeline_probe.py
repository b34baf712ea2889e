"""Host feature-pipeline throughput (VERDICT r4 item 3 / SURVEY §4.4-§4.5).

Every published q/s figure is DEVICE-only: bench.py pre-fills features in
memory by design, so the host pipeline — the .npy read + resample + batch
path that SURVEY §4.4 calls the host hot path — has never had a number. At
the 59k q/s charades_c3d headline with 64×4096 fp32 features per query,
a real eval would need ~57 GB/s of host reads; this probe measures what the
host side actually delivers and therefore what an honest end-to-end
deployment gets.

Method: build an on-disk corpus at flagship dims (per-video .npy, T_raw
rows × 4096 fp32, Charades-like annotation fan-out), then drain full epochs
through the REAL iterators:

  - BatchIterator (in-process), native C++ mmap read+resample
  - BatchIterator (in-process), NumPy fallback (DRN_NATIVE_READER=0)
  - GrainBatchIterator at several worker counts (native + NumPy)

Two epochs each: epoch 1 includes page-cache warmup, epoch 2 is the
steady-state (cache-warm) number — deployments re-reading an eval split
every epoch live in the warm regime; the cold number bounds first-epoch
ingest. Output: one JSON line per measurement + a summary with the
device-rate ratio.

    python scripts/host_pipeline_probe.py --videos 256 --out /tmp/corpus
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(root: str, videos: int, dim: int, rows_lo: int,
                 rows_hi: int, queries_per_video: int) -> dict:
    """Charades-STA-format on-disk corpus; returns size stats."""
    import numpy as np

    feat_dir = os.path.join(root, "feats")
    os.makedirs(feat_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    total_bytes = 0
    for v in range(videos):
        vid = f"VID{v:05d}"
        path = os.path.join(feat_dir, f"{vid}.npy")
        rows = int(rng.integers(rows_lo, rows_hi + 1))
        if not os.path.exists(path):
            np.save(path, rng.normal(size=(rows, dim)).astype(np.float32))
        total_bytes += rows * dim * 4
        dur = rows / 2.0  # feature_fps=2.0
        for q in range(queries_per_video):
            s = float(rng.uniform(0, dur * 0.6))
            e = float(rng.uniform(s + 1.0, dur))
            lines.append(f"{vid} {s:.1f} {e:.1f}##person does thing {q}.")
    ann = os.path.join(root, "charades_sta_train.txt")
    with open(ann, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return {"annotation": ann, "feature_dir": feat_dir,
            "examples": len(lines), "raw_gb": total_bytes / 1e9,
            "bytes_per_example": total_bytes * queries_per_video
            / max(len(lines), 1)}


def drain(it, epoch_idx: int) -> tuple:
    n = 0
    t0 = time.perf_counter()
    for batch in it.epoch(epoch_idx):
        n += int(batch["valid"].sum())
    return n, time.perf_counter() - t0


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="host feature-pipeline probe")
    p.add_argument("--out", default="/tmp/drn_host_corpus")
    p.add_argument("--videos", type=int, default=256)
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--rows", default="96,160",
                   help="raw feature row range lo,hi per video")
    p.add_argument("--queries-per-video", type=int, default=4)
    p.add_argument("--num-clips", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--workers", default="1,2,4,8")
    p.add_argument("--device-qps", type=float, default=59124.0,
                   help="device-only eval rate to ratio against "
                        "(BENCH charades_c3d row)")
    args = p.parse_args(argv)
    # This probe measures the HOST pipeline only — pin the CPU backend
    # here in main(), not at module level: staged_eval_probe.py imports
    # build_corpus from this file and must not inherit a CPU pin as an
    # import side effect (its TPU comparison would silently measure CPU).
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np  # noqa: F401  (corpus builder)

    from drn_tpu.config import get_config
    from drn_tpu.data.pipeline import (BatchIterator, GrainBatchIterator,
                                       make_dataset)

    rows_lo, rows_hi = (int(x) for x in args.rows.split(","))
    t0 = time.time()
    stats = build_corpus(args.out, args.videos, args.dim, rows_lo, rows_hi,
                         args.queries_per_video)
    print(f"[probe +{time.time() - t0:5.1f}s] corpus: {stats['examples']} "
          f"examples over {args.videos} videos, {stats['raw_gb']:.2f} GB "
          f"raw features", flush=True)

    cfg = get_config("charades_c3d")
    dcfg = dataclasses.replace(
        cfg.data, feature_dir=stats["feature_dir"],
        annotation_path=os.path.join(args.out, "charades_sta_{split}.txt"),
        feature_fps=2.0, num_clips=args.num_clips,
        batch_size=args.batch_size,
    )
    mcfg = dataclasses.replace(cfg.model, feature_dim=args.dim)

    def new_ds(cache_mb):
        # A FRESH dataset per measurement: the per-video LRU lives on the
        # dataset's reader, so reusing one dataset would hand later
        # "cold" epochs an LRU warmed by an earlier row whenever the
        # corpus fits the budget (inflating e.g. the NumPy-fallback rows
        # with native-read hits).
        return make_dataset(
            dataclasses.replace(dcfg, feature_cache_mb=cache_mb), mcfg,
            split="train")
    # Two distinct IO rates (an early version conflated them and
    # underreported reads 4x at 4 queries/video):
    # - corpus bytes/epoch: unique feature bytes — what the DISK must
    #   sustain on a cache-cold epoch (consecutive queries of the same
    #   video hit the page cache even cold).
    # - touched bytes/example: at cache=0 each example re-reads its whole
    #   video's features — the memory/page-cache traffic rate. With the
    #   per-video LRU (feature_cache_mb, the default) repeat queries skip
    #   the read entirely, so touched_mb_per_s overstates actual traffic
    #   by the hit rate on those rows.
    corpus_bytes = stats["raw_gb"] * 1e9
    touched_per_ex = stats["bytes_per_example"]

    results = []

    def measure(tag, make_it, env_native, cache_mb):
        os.environ["DRN_NATIVE_READER"] = env_native
        it = make_it()
        for epoch in (0, 1):
            n, dt = drain(it, epoch)
            row = {
                "pipeline": tag,
                "native_reader": env_native != "0",
                "feature_cache_mb": cache_mb,
                "epoch": "cold" if epoch == 0 else "warm",
                "examples_per_s": round(n / dt, 1),
                "corpus_mb_per_s": round(corpus_bytes / dt / 1e6, 1),
                "touched_mb_per_s": round(
                    n * touched_per_ex / dt / 1e6, 1),
                "examples": n,
                "seconds": round(dt, 2),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        os.environ["DRN_NATIVE_READER"] = "1"

    cache_mb = dcfg.feature_cache_mb
    # cache=0 rows reproduce the pre-cache committed baseline
    # (logs/host_pipeline_r5.log); cache-default rows are what a user of
    # the shipped config gets. Grain workers each hold their own cache
    # (the reader re-inits it on pickle) and the round-robin index split
    # interleaves a video's queries across workers, so their hit rate is
    # structurally lower than in-process — measured, not assumed.
    measure("BatchIterator", lambda: BatchIterator(
        new_ds(0.0), args.batch_size, shuffle=False), "1", 0.0)
    measure("BatchIterator", lambda: BatchIterator(
        new_ds(cache_mb), args.batch_size, shuffle=False), "1", cache_mb)
    measure("BatchIterator", lambda: BatchIterator(
        new_ds(0.0), args.batch_size, shuffle=False), "0", 0.0)
    measure("BatchIterator", lambda: BatchIterator(
        new_ds(cache_mb), args.batch_size, shuffle=False), "0", cache_mb)
    for w in (int(x) for x in args.workers.split(",")):
        measure(f"GrainBatchIterator(workers={w})", lambda w=w:
                GrainBatchIterator(new_ds(cache_mb), args.batch_size,
                                   shuffle=False, worker_count=w),
                "1", cache_mb)
    # NumPy fallback at the best worker count for the fallback guidance
    w_max = max(int(x) for x in args.workers.split(","))
    measure(f"GrainBatchIterator(workers={w_max})", lambda:
            GrainBatchIterator(new_ds(cache_mb), args.batch_size,
                               shuffle=False, worker_count=w_max),
            "0", cache_mb)

    warm = [r for r in results if r["epoch"] == "warm"]
    best = max(warm, key=lambda r: r["examples_per_s"])
    print(json.dumps({
        "probe": "host_pipeline",
        "corpus_examples": stats["examples"],
        "unique_bytes_per_example_mb": round(
            stats["raw_gb"] * 1e9 / stats["examples"] / 1e6, 3),
        "touched_bytes_per_example_mb": round(touched_per_ex / 1e6, 3),
        "best_warm": best,
        "device_qps": args.device_qps,
        "host_to_device_ratio": round(
            best["examples_per_s"] / args.device_qps, 4),
        "implied_end_to_end_qps": round(min(
            best["examples_per_s"], args.device_qps), 1),
        "results": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

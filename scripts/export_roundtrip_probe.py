"""Exported-artifact round-trip ON THE TPU BACKEND (VERDICT r4 item 8).

export.py's StableHLO artifact is CPU-round-trip-tested (tests/test_export.py)
but the claim that a serving host can load it and run it on a REAL TPU was
untested. This probe closes the loop in two separate processes:

    # process 1 — export (any backend; lowering is platform-targeted)
    python scripts/export_roundtrip_probe.py --mode export \
        --out /tmp/drn_export_probe
    # process 2 — FRESH process, TPU backend, load + run one batch
    python scripts/export_roundtrip_probe.py --mode run \
        --out /tmp/drn_export_probe

The run mode deliberately avoids build_model/config — only jax, numpy and
the artifact + sidecar, i.e. exactly what a serving host would have. The
exported step's outputs are checked for shape/finiteness and, because the
export process also saved the same batch + its OWN step outputs, for
numerical agreement (export-time backend vs load-time backend, fp32
decode tolerances).

`--mode both` runs export in-process then spawns a fresh interpreter for
the run phase (the committed log's regeneration command).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.time()


def _log(msg):
    print(f"[export_rt +{time.time() - _T0:6.1f}s] {msg}", flush=True)


def do_export(out: str, config: str, batch_size: int, cpu: bool):
    import numpy as np

    if cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    from drn_tpu.config import get_config
    from drn_tpu.export import (batch_spec, export_eval_step, save_exported)
    from drn_tpu.train import build_model, init_params

    os.makedirs(out, exist_ok=True)
    cfg = get_config(config)
    model = build_model(cfg)
    params = init_params(cfg, model, jax.random.key(0))
    backend = jax.default_backend()
    platforms = sorted({backend, "cpu", "tpu"} & {"cpu", "tpu", backend})
    _log(f"exporting {config} (batch {batch_size}) for platforms "
         f"{platforms} from backend {backend!r}")
    exported, sidecar = export_eval_step(cfg, model, params,
                                         batch_size=batch_size,
                                         platforms=platforms)
    art = os.path.join(out, "drn.hlo")
    save_exported(exported, sidecar, art)

    # Reference batch + reference outputs from THIS process's backend.
    rng = np.random.default_rng(0)
    spec = batch_spec(cfg, batch_size)
    batch = {
        "features": rng.normal(size=spec["features"].shape)
        .astype(np.float32),
        "word_ids": rng.integers(
            0, cfg.model.vocab_size, spec["word_ids"].shape)
        .astype(np.int32),
        "query_mask": np.ones(spec["query_mask"].shape, bool),
        "gt_grid": np.tile(np.asarray([2.0, 9.0], np.float32),
                           (batch_size, 1)),
        "duration": np.full((batch_size,), 30.0, np.float32),
        "valid": np.ones((batch_size,), bool),
    }
    host_params = jax.device_get(params)
    ref = jax.device_get(exported.call(host_params, batch))
    np.savez(os.path.join(out, "reference.npz"),
             **{k: batch[k] for k in batch},
             ref_segments=np.asarray(ref["segments_seconds"]),
             ref_scores=np.asarray(ref["scores"]),
             ref_keep=np.asarray(ref["nms_keep"]))
    # params as a flat npz so the run phase needs NO flax/model code
    flat = {"/".join(p): np.asarray(v) for p, v in
            ((list(map(str, path)), leaf) for path, leaf in
             _flatten(host_params))}
    np.savez(os.path.join(out, "params.npz"), **flat)
    with open(os.path.join(out, "params_tree.json"), "w") as f:
        json.dump(sorted(flat), f)
    _log(f"artifact + reference batch saved under {out} "
         f"(export backend outputs: scores {np.asarray(ref['scores']).shape})")


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def do_run(out: str):
    """Serving-host side: jax + numpy + the artifact only."""
    import numpy as np

    import jax
    from jax import export as jexport

    backend = jax.default_backend()
    with open(os.path.join(out, "drn.hlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(out, "drn.hlo.json")) as f:
        sidecar = json.load(f)
    _log(f"loaded artifact (platforms={sidecar['platforms']}) on "
         f"backend {backend!r}")
    data = np.load(os.path.join(out, "reference.npz"))
    batch = {k: data[k] for k in ("features", "word_ids", "query_mask",
                                  "gt_grid", "duration", "valid")}
    params = _unflatten(
        {k: v for k, v in np.load(os.path.join(out, "params.npz")).items()})
    t0 = time.time()
    got = jax.device_get(exported.call(params, batch))
    _log(f"one batch executed in {time.time() - t0:.1f}s (incl. compile)")

    segs = np.asarray(got["segments_seconds"])
    scores = np.asarray(got["scores"])
    keep = np.asarray(got["nms_keep"])
    assert np.isfinite(segs).all() and np.isfinite(scores).all()
    ref_segs, ref_scores = data["ref_segments"], data["ref_scores"]
    seg_diff = float(np.abs(segs - ref_segs).max())
    sc_diff = float(np.abs(scores - ref_scores).max())
    keep_match = float((keep == data["ref_keep"]).mean())
    print(json.dumps({
        "probe": "export_tpu_roundtrip",
        "run_backend": backend,
        "platforms": sidecar["platforms"],
        "scores_shape": list(scores.shape),
        "max_segment_diff_s": seg_diff,
        "max_score_diff": sc_diff,
        "nms_keep_agreement": keep_match,
        "ok": bool(seg_diff < 0.05 and sc_diff < 5e-3 and keep_match > 0.99),
    }))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="export TPU round-trip probe")
    p.add_argument("--mode", choices=("export", "run", "both"),
                   default="both")
    p.add_argument("--config", default="charades_c3d")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--out", default="/tmp/drn_export_probe")
    p.add_argument("--export-cpu", action="store_true",
                   help="export from the CPU backend (the cross-backend "
                        "case: lowered for tpu+cpu, run wherever)")
    args = p.parse_args(argv)
    if args.mode in ("export", "both"):
        do_export(args.out, args.config, args.batch_size, args.export_cpu)
    if args.mode == "run":
        do_run(args.out)
    elif args.mode == "both":
        _log("spawning a FRESH process for the run phase")
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--mode", "run", "--out", args.out],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).returncode
        return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())

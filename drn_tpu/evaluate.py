"""Evaluation: one jitted step = forward → decode → score → top-k → NMS →
recall counts, all on device (reference: `test.py` + NumPy NMS, SURVEY.md
§4.3 — the serial post-processing this framework eliminates).

tIoU is invariant under the grid→seconds scaling, so metrics are computed
directly in base-grid units; predicted segments are still returned in
seconds for the user-facing API.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh

from drn_tpu.config import ExperimentConfig, get_config
from drn_tpu.data.pipeline import (invalid_like, make_batch_iterator,
                                   make_dataset)
from drn_tpu.models import DRN
from drn_tpu.ops.nms import temporal_nms
from drn_tpu.ops.metrics import metric_name, recall_at_n
from drn_tpu.parallel import (aot_compile_synced, batch_sharding,
                              feature_sharding, mesh_process_count)
from drn_tpu.utils.checkpoint import CheckpointManager, prefer_best_dir
from drn_tpu.utils.logging import MetricLogger


_EVAL_STEP_CACHE: Dict[Any, Any] = {}


def get_eval_step(cfg: ExperimentConfig, model: DRN,
                  mesh: Optional[Mesh] = None):
    """Memoized make_eval_step: jit caches by function identity, so a fresh
    closure per call would re-trace (and possibly re-compile) the whole
    model — e.g. once per epoch for the in-training eval.

    Keyed by id(model) but guarded by a weakref: a recycled id after GC
    (CPython reuses addresses) can't silently hand back a step compiled
    for a dead model. Mesh participates by value (Mesh is hashable).

    LRU-bounded: evicting only the least-recently-used entry keeps the
    live entries' compiled steps warm (a wholesale clear() would cause a
    re-trace storm on the very next calls)."""
    import weakref

    key = (id(model), cfg.name, cfg.eval, mesh)
    ent = _EVAL_STEP_CACHE.get(key)
    if ent is not None and ent[1]() is model:
        _EVAL_STEP_CACHE[key] = _EVAL_STEP_CACHE.pop(key)  # mark recent
        return ent[0]
    while len(_EVAL_STEP_CACHE) > 16:  # bound: drop least-recently-used
        _EVAL_STEP_CACHE.pop(next(iter(_EVAL_STEP_CACHE)))
    step = make_eval_step(cfg, model, mesh)
    _EVAL_STEP_CACHE[key] = (step, weakref.ref(model))
    return step


def make_eval_step(cfg: ExperimentConfig, model: DRN,
                   mesh: Optional[Mesh] = None):
    """Jitted eval step; with `mesh`, batches are DP-sharded over the "data"
    axis and the recall counts come back as global (replicated) scalars —
    the DistributedSampler + metric-allreduce equivalent (SURVEY.md §4.3),
    with XLA inserting the cross-device reduction."""
    e = cfg.eval
    base_len = float(cfg.data.num_clips)
    bsh = batch_sharding(mesh) if mesh is not None else None
    fsh = feature_sharding(mesh) if mesh is not None else None

    @jax.jit
    def eval_step(params, batch, table=None):
        if bsh is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, {k: (fsh if k == "features" else bsh) for k in batch}
            )
        if "features" in batch:
            feats = batch["features"]
        else:
            # Device-resident feature store (data/staging.py): gather the
            # batch's grids from the staged (V, T, F) table in HBM.
            feats = table[batch["video_row"]]
            if fsh is not None:
                feats = jax.lax.with_sharding_constraint(feats, fsh)
        out = model.apply(
            params, feats, batch["word_ids"], batch["query_mask"]
        )
        score = jax.nn.sigmoid(out["match_logits"])
        if e.score_use_iou_head and e.score_iou_weight > 0.0:
            iou_s = jax.nn.sigmoid(out["iou_logits"])
            if e.score_iou_weight != 1.0:
                # Blend exponent (config.py EvalConfig.score_iou_weight):
                # sigmoid > 0 everywhere, so the fractional power is safe.
                iou_s = iou_s ** e.score_iou_weight
            score = score * iou_s
        top_scores, top_idx = jax.lax.top_k(score, e.top_k)
        top_segs = jnp.take_along_axis(
            out["segments"], top_idx[..., None], axis=1
        )
        _, keep, sorted_segs = jax.vmap(
            lambda s, sc: temporal_nms(s, sc, e.nms_iou_threshold)
        )(top_segs, top_scores)
        counts = recall_at_n(
            sorted_segs, keep, batch["gt_grid"],
            ns=e.recall_ns, iou_thresholds=e.iou_thresholds,
            valid=batch["valid"],
        )
        n_valid = jnp.sum(batch["valid"].astype(jnp.float32))
        scale = (batch["duration"] / base_len)[:, None, None]
        return counts, n_valid, sorted_segs * scale, keep, top_scores

    return eval_step


def _device_batches(batches, bsh, multiproc: bool):
    """Yield device-ready batches from a host iterator.

    Single-process: plain device_put (or host arrays without a mesh).
    Multi-process mesh (SPMD): every process must join each collective, so
    all processes run the SAME number of steps (`len(batches)` is computed
    from the GLOBAL dataset size on every process) and each contributes its
    local rows of the global batch via make_array_from_process_local_data —
    `jax.device_put(local, global_sharding)` would wrongly treat one host's
    local batch as the whole global array.

      * Grain iterators are already process-sharded (ShardByJaxProcess):
        the local batch IS this process's slice; global batch = B × P.
      * The in-process BatchIterator yields identical full batches on every
        process (same seed, shuffle=False for eval): each process keeps
        only its own row block, so the global batch is each batch exactly
        once.
      * A process whose shard exhausts early (Grain shards can differ by
        one record) feeds all-invalid padding batches to stay in lockstep.
    """
    if not multiproc:
        for batch in batches.epoch(0):
            if bsh is None:
                yield {k: jnp.asarray(v) for k, v in batch.items()}
            else:
                yield {k: jax.device_put(v, bsh) for k, v in batch.items()}
        return

    from drn_tpu.data.pipeline import GrainBatchIterator

    presharded = isinstance(batches, GrainBatchIterator)
    pi, np_ = jax.process_index(), jax.process_count()
    it = iter(batches.epoch(0))
    template = None
    for _ in range(len(batches)):
        local = next(it, None)
        if local is None:
            assert template is not None, (
                "process shard is empty; dataset smaller than process count"
            )
            local = invalid_like(template)
        if not presharded:
            b = local["valid"].shape[0]
            assert b % np_ == 0, (b, np_)
            lo = (b // np_) * pi
            local = {k: v[lo:lo + b // np_] for k, v in local.items()}
        template = local
        yield {
            k: jax.make_array_from_process_local_data(bsh, np.asarray(v))
            for k, v in local.items()
        }


def evaluate(cfg: ExperimentConfig, model: DRN, params, dataset=None,
             split: str = "test", mesh: Optional[Mesh] = None,
             device_features: bool = False) -> Dict[str, float]:
    """Full-split evaluation → {"R@n,IoU=m": percentage}.

    `device_features` stages each unique video's resampled grid into one
    device-resident table before the loop (data/staging.py): the host
    then feeds only word ids + row indices, so eval is no longer bound
    by per-example feature reads — the honest-end-to-end answer to the
    host-pipeline gap measured in operations.md §6. Metrics are
    bit-identical to the streaming path (tests/test_staging.py)."""
    table_dev = None
    if device_features:
        import jax as _jax

        if _jax.process_count() > 1:
            raise NotImplementedError(
                "device_features stages one process-local table; "
                "multi-process eval shards examples per process, so each "
                "process would need its own staging pass keyed to its "
                "shard. On multi-host meshes use the streaming path with "
                "data.feature_cache_mb sized to the corpus — each "
                "process then reads its shard's videos once and serves "
                "repeats from host RAM (the same IO win, minus the HBM "
                "gather)")
        if cfg.data.dataset == "synthetic":
            raise ValueError(
                "device_features reads per-video feature files; the "
                "synthetic fixture generates features in memory")
        from drn_tpu.data.staging import stage_video_features

        if dataset is None:
            dataset = make_dataset(cfg.data, cfg.model, split=split)
        table, dataset = stage_video_features(dataset)
        if mesh is not None:
            from drn_tpu.parallel import replicate

            table_dev = jax.device_put(table, replicate(mesh))
        else:
            table_dev = jnp.asarray(table)
        del table  # one device copy; drop the ~GB host one (train.py does too)
    if dataset is None:
        dataset = make_dataset(cfg.data, cfg.model, split=split)
    batches = make_batch_iterator(
        dataset,
        dataclasses.replace(cfg.data, batch_size=cfg.eval.batch_size),
        shuffle=False, seed=0,
    )
    step = get_eval_step(cfg, model, mesh)
    bsh = batch_sharding(mesh) if mesh is not None else None
    multiproc = mesh is not None and mesh_process_count(mesh) > 1
    # Accumulate count scalars ON DEVICE and fetch once at the end — a
    # per-batch device_get would host-sync every batch (30 ms RTT on
    # relay-attached TPUs dominates the 3 ms step).
    totals_dev: Optional[Dict[Tuple[int, float], jnp.ndarray]] = None
    n_total_dev = None
    exec_step = step
    for jb in _device_batches(batches, bsh, multiproc):
        if multiproc and exec_step is step:
            # AOT-compile + coordination-service rendezvous before the
            # first execution: Gloo's per-executable first-collective
            # deadline is a hard ~30 s, which compile-time skew between
            # processes can exceed (parallel/mesh.py::aot_compile_synced).
            # Shapes are static, so the compiled object serves every batch —
            # and is cached ON the jitted step across evaluate() calls
            # (periodic val eval must not recompile every epoch). The key
            # covers the batch AND the params placement: the executable is
            # specialized to input shardings, so the same step evaluated
            # later with differently-placed params (e.g. host/replicated
            # after a TP-sharded training run) must recompile, not hit.
            # The cache state evolves identically on every process (SPMD),
            # so the barrier fires on the same calls everywhere.
            def _leaf_sig(v):
                return (v.shape, str(v.dtype), str(getattr(v, "sharding", "")))

            key = (
                tuple(sorted((k,) + _leaf_sig(v) for k, v in jb.items())),
                tuple(_leaf_sig(v) for v in jax.tree_util.tree_leaves(params)),
            )
            cache = getattr(step, "_aot_cache", None)
            if cache is None:
                cache = step._aot_cache = {}
            if key not in cache:
                cache[key] = aot_compile_synced(
                    step, params, jb, name="drn_eval_step_compiled"
                )
            exec_step = cache[key]
        counts, n_valid, *_ = (
            exec_step(params, jb, table_dev) if table_dev is not None
            else exec_step(params, jb))
        if totals_dev is None:
            totals_dev, n_total_dev = counts, n_valid
        else:
            totals_dev = {k: totals_dev[k] + v for k, v in counts.items()}
            n_total_dev = n_total_dev + n_valid
    totals = {k: float(v) for k, v in jax.device_get(totals_dev or {}).items()}
    n_total = float(n_total_dev) if n_total_dev is not None else 0.0
    if jax.process_count() > 1 and not multiproc:
        # Per-process eval (no global mesh): each process evaluated its own
        # data shard on its own devices; sum counters across hosts — the
        # reference's metric allreduce across DDP ranks (SURVEY.md §4.3).
        # (With a multi-process mesh the counts are ALREADY global: the
        # eval step reduces over the whole "data" axis, so a second
        # allgather-sum would multiply them by process_count.)
        from jax.experimental import multihost_utils

        keys = sorted(totals, key=str)
        local = np.asarray([n_total] + [totals[k] for k in keys], np.float64)
        summed = np.asarray(
            multihost_utils.process_allgather(local)
        ).sum(axis=0)
        n_total = float(summed[0])
        totals = {k: float(summed[i + 1]) for i, k in enumerate(keys)}
    return {
        metric_name(k): 100.0 * v / max(n_total, 1.0)
        for k, v in sorted(totals.items(), key=str)
    }


def predict(cfg: ExperimentConfig, model: DRN, params, batch):
    """User-facing inference: top segments in SECONDS + scores, post-NMS.
    The compiled step is memoized per (config, model) so repeated calls
    don't re-trace.

    Optional batch keys (each independently defaulted): "gt_grid",
    "valid", and "duration" — without per-video durations (seconds) the
    returned segments are in base-grid units (scale 1)."""
    step = get_eval_step(cfg, model)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    b = jb["features"].shape[0]
    if "gt_grid" not in jb:  # inference without labels
        jb["gt_grid"] = jnp.zeros((b, 2), jnp.float32)
    if "valid" not in jb:  # independently optional — don't couple the two
        jb["valid"] = jnp.ones((b,), bool)
    if "duration" not in jb:  # grid units when no duration is known
        jb["duration"] = jnp.full((b,), float(cfg.data.num_clips),
                                  jnp.float32)
    _, _, segs_sec, keep, scores = step(params, jb)
    return (
        np.asarray(segs_sec),
        np.asarray(keep),
        np.asarray(scores),
    )


def main(argv=None):
    p = argparse.ArgumentParser(description="drn_tpu evaluator")
    p.add_argument("--config", default="charades_c3d")
    p.add_argument("--checkpoint-dir", default=None,
                   help="Orbax checkpoint directory")
    p.add_argument("--torch-checkpoint", default=None,
                   help=".pth in the parity schema — the one-command "
                        "reference-checkpoint evaluation (converted on "
                        "the fly via drn_tpu.parity)")
    p.add_argument("--split", default="test")
    p.add_argument("--feature-dir", default=None)
    p.add_argument("--annotation-path", default=None)
    p.add_argument("--glove-path", default=None)
    p.add_argument("--latest-checkpoint", action="store_true",
                   help="restore the latest step instead of the "
                        "best-on-val checkpoint (the default when "
                        "<checkpoint-dir>/best exists)")
    p.add_argument("--allow-config-mismatch", action="store_true",
                   help="downgrade the checkpoint-vs-active config parity "
                        "check to a warning")
    p.add_argument("--device-features", action="store_true",
                   help="stage each unique video's resampled features "
                        "into one device-resident table before the eval "
                        "loop (V*num_clips*F*4 bytes of HBM) — removes "
                        "the per-example host feature reads that "
                        "otherwise bound end-to-end eval "
                        "(operations.md §6)")
    args = p.parse_args(argv)
    if not args.checkpoint_dir and not args.torch_checkpoint:
        p.error("one of --checkpoint-dir / --torch-checkpoint is required")
    if args.checkpoint_dir and args.torch_checkpoint:
        p.error("--checkpoint-dir and --torch-checkpoint are mutually "
                "exclusive; pass exactly one parameter source")

    from drn_tpu.utils import enable_jit_cache

    enable_jit_cache()
    cfg = get_config(args.config)
    da = {}
    if args.feature_dir:
        da["feature_dir"] = args.feature_dir
    if args.annotation_path:
        da["annotation_path"] = args.annotation_path
    if args.glove_path:
        da["glove_path"] = args.glove_path
    if da:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **da))

    from drn_tpu.data.pipeline import build_vocab
    from drn_tpu.train import build_model, init_params

    vocab = build_vocab(cfg.data, cfg.model)
    model = build_model(cfg, pretrained_embeddings=vocab.embeddings)
    if args.torch_checkpoint:
        from drn_tpu.parity.convert import load_torch_checkpoint

        # No init_state here: the Orbax restore below needs a template
        # tree, but the torch conversion builds the full params itself —
        # skipping init avoids a wasted full-model device compile.
        params = load_torch_checkpoint(args.torch_checkpoint, cfg.model)
    else:
        from drn_tpu.utils.checkpoint import check_experiment_config

        # Parity guard: a checkpoint trained under different
        # level_ranges / dims / grid decodes silently wrong.
        check_experiment_config(
            args.checkpoint_dir, cfg,
            allow_mismatch=args.allow_config_mismatch, context="evaluate")
        template = init_params(cfg, model, jax.random.key(0))
        ckpt_dir = prefer_best_dir(args.checkpoint_dir,
                                   prefer=not args.latest_checkpoint)
        ckpt = CheckpointManager(ckpt_dir)
        restored = ckpt.restore({"params": template}, partial=True)
        if restored is None:
            raise FileNotFoundError(
                f"no checkpoint in {args.checkpoint_dir}")
        params = restored["params"]
    dataset = make_dataset(cfg.data, cfg.model, vocab=vocab,
                           split=args.split)
    results = evaluate(cfg, model, params, dataset=dataset,
                       split=args.split,
                       device_features=args.device_features)
    log = MetricLogger(f"eval/{cfg.name}")
    log.log(0, results)
    for k, v in results.items():
        print(f"{k}: {v:.2f}")


if __name__ == "__main__":
    main()

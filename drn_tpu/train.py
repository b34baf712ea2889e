"""Training entrypoint: jitted train step, two-stage recipe, DP/TP mesh.

Reference equivalent: `train.py` under torch.distributed.launch (SURVEY.md
§4.1/§4.2). One compiled `train_step(state, batch) → (state, metrics)` with
donated state; the epoch loop is pure host orchestration. Stage 2 restores
the stage-1 checkpoint and turns on the IoU-head loss (targets from the
model's own regressions).

CLI:
    python -m drn_tpu.train --config charades_c3d --stage 1
    python -m drn_tpu.train --config charades_c3d --stage 2 \
        --init-from /path/to/stage1_ckpt
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import Mesh

from drn_tpu.config import ExperimentConfig, get_config
from drn_tpu.data.pipeline import (build_vocab, invalid_like,
                                   make_batch_iterator, make_dataset)
from drn_tpu.models import DRN
from drn_tpu.models.drn import location_metadata
from drn_tpu.models.losses import drn_loss
from drn_tpu.parallel import (aot_compile_synced, batch_sharding,
                              feature_sharding, make_mesh,
                              mesh_process_count, param_shardings, replicate)
from drn_tpu.utils.checkpoint import (BestCheckpointTracker,
                                      CheckpointManager,
                                      check_experiment_config,
                                      load_loader_state, prefer_best_dir,
                                      save_experiment_config,
                                      save_loader_state)
from drn_tpu.utils.logging import MetricLogger
from drn_tpu.utils.preemption import PreemptionGuard, exit_code_for


class TrainState(train_state.TrainState):
    pass


def make_optimizer(cfg: ExperimentConfig, steps_per_epoch: int):
    t = cfg.train
    # Inside optax the schedule is indexed by OPTIMIZER updates (MultiSteps
    # advances the inner chain once per accumulation cycle), so the
    # per-epoch boundaries must be divided by accum_steps — otherwise
    # accumulation silently delays every LR decay by that factor.
    updates_per_epoch = steps_per_epoch / max(t.accum_steps, 1)
    # Under heavy accumulation two decay epochs can truncate to the SAME
    # update index; compound the rates there (both decays still happen)
    # instead of letting a dict literal silently drop one.
    boundaries: Dict[int, float] = {}
    for e in t.lr_decay_epochs:
        b = max(int(e * updates_per_epoch), 1)
        boundaries[b] = boundaries.get(b, 1.0) * t.lr_decay_rate
    sched = optax.piecewise_constant_schedule(t.learning_rate, boundaries)

    def decay_mask(params):
        # Never weight-decay the embedding table: in GloVe mode the table
        # is frozen via stop_gradient, which zeroes its *gradient* but not
        # adamw's additive -lr*wd*param term — with a bare adamw the
        # "frozen" pretrained table would decay geometrically toward zero.
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not any(
                getattr(p, "key", None) == "embedding" for p in path
            ),
            params,
        )

    opt = optax.chain(
        optax.clip_by_global_norm(t.grad_clip_norm),
        optax.adamw(sched, weight_decay=t.weight_decay, mask=decay_mask)
        if t.weight_decay > 0
        else optax.adam(sched),
    )
    if t.stage >= 2 and t.stage2_iou_only:
        # Freeze everything but the IoU head (stage-2-only training).
        # multi_transform + set_to_zero (optax.masked would pass raw
        # gradients through as updates for the unmasked leaves).
        def labels(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "train" if any(
                    getattr(p, "key", None) == "iou_head" for p in path
                ) else "freeze",
                params,
            )

        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels
        )
    if t.accum_steps > 1:
        # Average accum_steps micro-batch gradients per optimizer update
        # (large effective batch without the activation memory).
        opt = optax.MultiSteps(opt, every_k_schedule=t.accum_steps)
    return opt


def build_model(cfg: ExperimentConfig,
                pretrained_embeddings: Optional[np.ndarray] = None) -> DRN:
    mcfg = cfg.model
    if (pretrained_embeddings is not None
            and mcfg.vocab_size != pretrained_embeddings.shape[0]):
        # GloVe mode: the table size follows the (filtered) vocab, so the
        # model's id space matches the dataset encoder's.
        mcfg = dataclasses.replace(
            mcfg, vocab_size=pretrained_embeddings.shape[0]
        )
    return DRN(
        mcfg,
        base_len=cfg.data.num_clips,
        pretrained_embeddings=pretrained_embeddings,
        freeze_embeddings=pretrained_embeddings is not None,
    )


def init_params(cfg: ExperimentConfig, model: DRN, rng):
    """Params-only init — the restore template for eval-only entry points
    (evaluate/infer/serve/export), which never touch optimizer state;
    init_state would allocate two param-sized Adam moment buffers on
    device just to discard them."""
    d = cfg.data
    feats = jnp.zeros((2, d.num_clips, cfg.model.feature_dim), jnp.float32)
    words = jnp.zeros((2, d.max_query_len), jnp.int32)
    mask = jnp.ones((2, d.max_query_len), bool)
    # jit: ONE compiled program. Eager init dispatches hundreds of tiny
    # ops — measured 150-350 s through this sandbox's TPU relay (each op
    # is a fresh little compile), vs seconds for the single jitted one.
    return jax.jit(model.init)(rng, feats, words, mask)


def init_state(cfg: ExperimentConfig, model: DRN, tx, rng) -> TrainState:
    params = init_params(cfg, model, rng)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def make_train_step(cfg: ExperimentConfig, model: DRN, mesh: Optional[Mesh]):
    locs, _, level_ids = location_metadata(cfg.model, cfg.data.num_clips)
    base_len = cfg.data.num_clips
    bsh = batch_sharding(mesh) if mesh is not None else None
    fsh = feature_sharding(mesh) if mesh is not None else None

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                table=None
                ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if bsh is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, {k: (fsh if k == "features" else bsh) for k in batch}
            )
        if "features" in batch:
            feats = batch["features"]
        else:
            # Device-resident feature store (data/staging.py): the epoch
            # loop re-reads nothing from disk — grids gather from the
            # staged table in HBM. No gradient flows into the table
            # (features are inputs), so training semantics are untouched.
            feats = table[batch["video_row"]]
            if fsh is not None:
                feats = jax.lax.with_sharding_constraint(feats, fsh)

        def loss_fn(params):
            out = model.apply(
                params, feats, batch["word_ids"],
                batch["query_mask"],
            )
            return drn_loss(
                cfg.model, cfg.train, out, locs, level_ids,
                batch["gt_grid"], base_len, batch["valid"],
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def shard_state(state: TrainState, mesh: Mesh,
                tp_min_width: int = 128) -> TrainState:
    """Place params per the TP rules; opt_state inherits via a fresh tx.init
    on the sharded params (optax moments are zeros_like → same shardings),
    onto which any restored opt_state values are transferred."""
    psh = param_shardings(state.params, mesh, min_width=tp_min_width)
    params = jax.device_put(state.params, psh)
    fresh_opt = state.tx.init(params)

    def _sh(x):
        s = getattr(x, "sharding", None)
        if s is not None and getattr(s, "mesh", None) is not None:
            try:
                if s.mesh.shape == mesh.shape:
                    return s
            except AttributeError:
                pass
        return replicate(mesh)

    opt_shardings = jax.tree.map(_sh, fresh_opt)
    opt_state = jax.device_put(state.opt_state, opt_shardings)
    step = jax.device_put(state.step, replicate(mesh))
    return state.replace(params=params, opt_state=opt_state, step=step)


def put_batch(batch: Dict[str, np.ndarray], mesh: Optional[Mesh]):
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    bsh = batch_sharding(mesh)
    if mesh_process_count(mesh) > 1:
        # SPMD across hosts: this process's batch is its slice of the
        # global batch (Grain ShardByJaxProcess, or pre-sliced by the
        # caller); device_put with a global sharding would wrongly treat
        # the local rows as the whole global array.
        return {
            k: jax.make_array_from_process_local_data(bsh, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, bsh) for k, v in batch.items()}


_invalid_like = invalid_like  # shared with evaluate._device_batches


def lockstep_epoch(batches, epoch: int, skip: int, n_steps: int,
                   resume_state=None):
    """Yield exactly `n_steps` local batches from `batches.epoch(epoch)`.

    Multi-host SPMD requires every process to run the SAME number of train
    steps — each step is a collective. Grain's ShardByJaxProcess shards can
    differ by one record across processes, so a short-shard host would
    exhaust its local iterator one batch early and leave the others blocked
    in psum forever (evaluate() pads the same way in `_device_batches`).
    The padding batches are all-invalid: the global step still trains on
    the other hosts' real rows."""
    kw = {"resume_state": resume_state} if resume_state is not None else {}
    it = iter(batches.epoch(epoch, skip_batches=skip, **kw))
    template = None
    for _ in range(n_steps):
        local = next(it, None)
        if local is None:
            assert template is not None, (
                "process shard is empty; dataset smaller than process count"
            )
            local = _invalid_like(template)
        template = local
        yield local


def _default_eval_fn(cfg: ExperimentConfig, model: DRN,
                     mesh: Optional[Mesh], vocab=None):
    """Periodic val-split R@n,IoU@m during training (SURVEY.md §4.1
    '(periodic) evaluate()'). Prefers the val split — evaluating on test
    during training would leak the test set into model selection — and
    falls back to test only when no val annotations exist (Charades-STA
    ships only train/test). Returns None when no split is available
    (e.g. annotation files absent in CI). `vocab` must be the training
    vocab so word ids match the embedding table."""
    ann = cfg.data.annotation_path
    if ann and "{split}" not in ann:
        # A split-less annotation path loads the SAME file for every
        # split, so "val"/"test" eval would silently score the training
        # annotations — the exact leakage this function exists to avoid.
        print(
            f"[train] annotation_path {ann!r} has no '{{split}}' "
            f"placeholder; skipping in-training eval (run "
            f"drn_tpu.evaluate with the val/test file explicitly)",
            flush=True,
        )
        return None
    splits = ([cfg.data.val_split] if cfg.data.val_split
              else ["val", "test"])
    dataset = None
    for split in splits:
        try:
            dataset = make_dataset(cfg.data, cfg.model, vocab=vocab,
                                   split=split)
            break
        except FileNotFoundError:
            continue  # split simply absent (e.g. Charades has no val)
        except (KeyError, ValueError) as e:
            # The file EXISTS but failed to parse — silently skipping
            # would disable in-training eval AND best-on-val tracking
            # with no trace (VERDICT r4 item 6). Loud, named warning;
            # training itself still proceeds.
            print(
                f"[train] WARNING: {split!r} annotations exist but are "
                f"unreadable ({type(e).__name__}: {e}); skipping this "
                f"split for in-training eval. If no other split loads, "
                f"periodic eval and best-on-val tracking are DISABLED "
                f"for this run — fix the file (see drn_tpu.data.validate "
                f"/ train.py --preflight).",
                flush=True,
            )
            continue
    if dataset is None:
        return None
    from drn_tpu.evaluate import evaluate

    log = MetricLogger(f"eval/{cfg.name}")

    def fn(state, epoch):
        results = evaluate(cfg, model, state.params, dataset=dataset,
                           mesh=mesh)
        log.log(epoch, results)
        return selection_metric(results)

    return fn


def selection_metric(results: Optional[Dict[str, float]]) -> Optional[float]:
    """Scalar used for best-on-val checkpoint selection: R@1,IoU=0.5 (the
    headline metric), falling back to the mean of R@1 rows, then of all."""
    if not results:
        return None
    if "R@1,IoU=0.5" in results:
        return float(results["R@1,IoU=0.5"])
    r1 = [v for k, v in results.items() if k.startswith("R@1")]
    return float(np.mean(r1 if r1 else list(results.values())))


def train(cfg: ExperimentConfig, *, mesh: Optional[Mesh] = None,
          init_from: Optional[str] = None, max_steps: Optional[int] = None,
          eval_fn=None,
          preemption_guard: Optional[PreemptionGuard] = None,
          allow_config_mismatch: bool = False,
          run_info: Optional[dict] = None,
          device_features: bool = False) -> TrainState:
    """Full training run; returns final state (host-side orchestration only).

    SIGTERM (cluster preemption notice) stops the loop at the next step
    boundary, force-saves state + data-iterator position, and returns —
    a `--resume` run then continues from the exact step. Pass your own
    installed `preemption_guard` to observe `guard.triggered` after.
    `run_info` (a caller-owned dict) receives `start_step` — the step the
    run actually began from after any checkpoint restore, so callers and
    tests can distinguish a real resume from a silent fresh start."""
    log = MetricLogger(f"train/{cfg.name}/stage{cfg.train.stage}",
                       tensorboard_dir=cfg.train.tensorboard_dir)
    vocab = build_vocab(cfg.data, cfg.model)
    dataset = make_dataset(cfg.data, cfg.model, vocab=vocab, split="train")
    feature_table = None  # host copy; device placement after shard_state
    if device_features:
        # Stage each unique video's grid once; every epoch after reads
        # nothing from disk (data/staging.py — the answer to the measured
        # host-pipeline bound, operations.md §6). Shuffled epochs
        # especially profit: random order has no read locality for the
        # per-video LRU, but a staged table doesn't care about order.
        if jax.process_count() > 1:
            raise NotImplementedError(
                "device_features stages one process-local table; Grain "
                "shards examples per process, so each process would need "
                "a shard-keyed staging pass. On multi-host runs use the "
                "streaming path with data.feature_cache_mb sized to the "
                "corpus — each process reads its shard's videos once and "
                "serves repeats from host RAM (the same IO win, minus "
                "the HBM gather)")
        if cfg.data.dataset == "synthetic":
            raise ValueError(
                "device_features reads per-video feature files; the "
                "synthetic fixture generates features in memory")
        from drn_tpu.data.staging import stage_video_features

        feature_table, dataset = stage_video_features(dataset)
    batches = make_batch_iterator(
        dataset, cfg.data, shuffle=True, seed=cfg.train.seed
    )
    steps_per_epoch = len(batches)

    model = build_model(cfg, pretrained_embeddings=vocab.embeddings)
    tx = make_optimizer(cfg, steps_per_epoch)
    state = init_state(cfg, model, tx, jax.random.key(cfg.train.seed))

    ckpt_dir = f"{cfg.train.checkpoint_dir}/{cfg.name}/stage{cfg.train.stage}"
    ckpt = CheckpointManager(
        ckpt_dir,
        keep=cfg.train.keep_checkpoints,
        save_interval_steps=cfg.train.checkpoint_every_steps,
    )
    best: Optional[BestCheckpointTracker] = None  # created on first val
    if init_from:  # stage-2 init from stage-1 params (best-on-val if kept)
        # Parity guard: loading stage-1 params trained under different
        # level_ranges / dims / grid would decode silently wrong.
        check_experiment_config(init_from, cfg,
                                allow_mismatch=allow_config_mismatch,
                                context="--init-from")
        src = CheckpointManager(prefer_best_dir(init_from))
        # Host (numpy) template → Orbax restores to host memory on every
        # process; a device-array template can come back pinned to the
        # SAVING process's device (non-addressable here), which
        # shard_state's device_put can't move across hosts.
        restored = src.restore({"params": jax.device_get(state.params)},
                               partial=True)
        if restored is not None:
            # Host arrays, not device arrays: a multi-process restore can
            # hand back arrays pinned to the SAVING process's device
            # (non-addressable here), and shard_state's device_put would
            # then demand an unsupported cross-host transfer.
            state = state.replace(params=jax.device_get(restored["params"]))
        src.close()
    if cfg.train.resume:
        check_experiment_config(ckpt_dir, cfg,
                                allow_mismatch=allow_config_mismatch,
                                context="resume")
        restored = ckpt.restore(
            {"params": jax.device_get(state.params),
             "opt_state": jax.device_get(state.opt_state), "step": 0}
        )
        if restored is not None:
            # device_get for the same reason as the --init-from branch:
            # restored arrays may be pinned to another process's device.
            state = state.replace(
                params=jax.device_get(restored["params"]),
                opt_state=jax.device_get(restored["opt_state"]),
                step=int(restored["step"]),
            )
    if jax.process_index() == 0:
        # Config provenance: every checkpoint dir carries the full config
        # that produced it, so restores (here, evaluate, infer, serve)
        # can detect parity-relevant drift. Written AFTER the checks
        # above — a legitimate (or overridden) run then records the
        # config actually in effect.
        if not cfg.train.resume:
            # A FRESH run into a dir that already holds another config's
            # provenance would re-attribute any existing Orbax steps to
            # the new config — a later restore of one of those old steps
            # then PASSES the parity guard it should trip (ADVICE r4).
            # Warn loudly; the overwrite below still proceeds (the user
            # may be intentionally recycling the directory).
            from drn_tpu.utils.checkpoint import (config_parity_diffs,
                                                  load_experiment_config)

            stale = load_experiment_config(ckpt_dir)
            if stale is not None and config_parity_diffs(
                    stale, cfg, warn_on_skew=False):
                print(
                    f"[train] WARNING: {ckpt_dir!r} already contains "
                    f"provenance for a parity-DIFFERENT config "
                    f"({stale.get('name', '?')!r}); overwriting it. Any "
                    f"pre-existing checkpoint steps in this directory "
                    f"belong to the OLD config — use a fresh "
                    f"--checkpoint-dir to keep them distinguishable.",
                    flush=True,
                )
        save_experiment_config(ckpt_dir, cfg)

    if mesh is not None:
        state = shard_state(state, mesh)
    table_dev = None
    if feature_table is not None:
        table_dev = (jax.device_put(feature_table, replicate(mesh))
                     if mesh is not None else jnp.asarray(feature_table))
        del feature_table  # one device copy; drop the host one
    train_step = make_train_step(cfg, model, mesh)
    # Multi-process: AOT-compile on the first batch, rendezvous through
    # the coordination service, then execute the compiled object (shapes
    # are static, so one executable serves every step). Without this, a
    # process whose compile finishes first hits Gloo's hard ~30 s
    # first-collective deadline while a sibling is still compiling
    # (parallel/mesh.py::coordination_barrier).
    compiled_step = None

    if eval_fn is None:
        eval_fn = _default_eval_fn(cfg, model, mesh, vocab=vocab)

    guard = preemption_guard
    own_guard = guard is None
    if own_guard:
        guard = PreemptionGuard().install()

    start_step = int(state.step)  # >0 when resumed from a checkpoint
    if run_info is not None:
        run_info["start_step"] = start_step
    step = 0
    done = False
    multiproc = mesh is not None and mesh_process_count(mesh) > 1
    from drn_tpu.data.pipeline import GrainBatchIterator

    presharded = isinstance(batches, GrainBatchIterator)
    pi, n_proc = jax.process_index(), jax.process_count()
    for epoch in range(cfg.train.num_epochs):
        if done:
            break
        if steps_per_epoch and (epoch + 1) * steps_per_epoch <= start_step:
            # Epoch fully covered by the restored checkpoint: skip it by
            # arithmetic — no feature reads, no batch materialization.
            step = (epoch + 1) * steps_per_epoch
            continue
        skip = max(start_step - step, 0)  # mid-epoch resume point
        step += skip
        # Mid-epoch Grain resume: restore the iterator state saved with
        # the checkpoint — zero feature reads for the skipped batches
        # (falls back to consume-and-discard when no blob exists).
        resume_state = None
        if skip and step == start_step and hasattr(batches, "get_state"):
            resume_state = load_loader_state(
                ckpt_dir, start_step, jax.process_index()
            )
        if multiproc and presharded:
            # Grain shards can be ragged across processes; run the global
            # step count in lockstep (see lockstep_epoch).
            epoch_batches = lockstep_epoch(
                batches, epoch, skip, steps_per_epoch - skip,
                resume_state=resume_state,
            )
        elif resume_state is not None:
            epoch_batches = batches.epoch(epoch, skip_batches=skip,
                                          resume_state=resume_state)
        else:
            epoch_batches = batches.epoch(epoch, skip_batches=skip)
        for batch in epoch_batches:
            if multiproc and not presharded:
                # The in-process iterator yields identical global batches
                # on every process; keep only this process's row block
                # (put_batch assembles them back into the global array).
                b = batch["valid"].shape[0]
                assert b % n_proc == 0, (b, n_proc)
                lo = (b // n_proc) * pi
                batch = {k: v[lo:lo + b // n_proc] for k, v in batch.items()}
            pb = put_batch(batch, mesh)
            if multiproc and compiled_step is None:
                compiled_step = aot_compile_synced(
                    train_step, state, pb, name="drn_train_step_compiled"
                )
            if table_dev is not None:  # staged: single-process by check
                state, metrics = train_step(state, pb, table_dev)
            else:
                state, metrics = (compiled_step or train_step)(state, pb)
            step += 1
            if step % cfg.train.log_every_steps == 0 or step == 1:
                log.log(step, {"epoch": epoch, **jax.device_get(metrics)})
            # device_get only when Orbax will actually persist this step —
            # a per-step full-state fetch would host-sync every iteration.
            if ckpt.should_save(step):
                ckpt.save(
                    step,
                    {"params": jax.device_get(state.params),
                     "opt_state": jax.device_get(state.opt_state),
                     "step": step},
                )
                # Data-iterator position for a read-free mid-epoch resume.
                blob = (batches.get_state()
                        if hasattr(batches, "get_state") else None)
                if blob is not None:
                    save_loader_state(ckpt_dir, step, blob,
                                      jax.process_index(),
                                      keep=cfg.train.keep_checkpoints)
            if max_steps is not None and step >= max_steps:
                done = True
                break
            if guard.preempted_at(step):
                # Preemption notice: stop NOW (skip eval — the grace
                # period is for the save); the post-loop force-save +
                # loader-state blob below are the preemption checkpoint.
                log.log(step, {"epoch": epoch, "preempted": 1.0})
                done = True
                break
        if (eval_fn is not None and not done
                and cfg.train.eval_every_epochs > 0
                and (epoch + 1) % cfg.train.eval_every_epochs == 0):
            val = eval_fn(state, epoch)
            # Best-on-val checkpoint (the reference keeps a "best" ckpt,
            # SURVEY.md §3 Checkpointing); evaluate/infer/serve prefer it.
            if val is not None:
                if best is None:
                    best = BestCheckpointTracker(ckpt_dir)
                if best.update(step, jax.device_get(state.params),
                               float(val)):
                    log.log(step, {"epoch": epoch,
                                   "best_val_metric": float(val)})
    ckpt.save(
        step,
        {"params": jax.device_get(state.params),
         "opt_state": jax.device_get(state.opt_state), "step": step},
        force=True,
    )
    # A max_steps stop can land mid-epoch; persist the iterator position
    # so a resume from this final save is read-free too.
    blob = batches.get_state() if hasattr(batches, "get_state") else None
    if blob is not None:
        save_loader_state(ckpt_dir, step, blob, jax.process_index(),
                          keep=cfg.train.keep_checkpoints)
    ckpt.wait()
    ckpt.close()
    if best is not None:
        best.wait()
        best.close()
    if own_guard:
        guard.uninstall()
    return state


def main(argv=None):
    p = argparse.ArgumentParser(description="drn_tpu trainer")
    p.add_argument("--config", default="charades_c3d")
    p.add_argument("--stage", type=int, default=None)
    p.add_argument("--stage2-iou-only", action="store_true",
                   help="stage 2: train only the IoU head (freeze the rest; "
                        "this is the config default — kept for script "
                        "back-compat)")
    p.add_argument("--stage2-joint", action="store_true",
                   help="stage 2: fine-tune the whole network jointly "
                        "instead of the default IoU-head freeze (measured "
                        "worse: docs/design.md §4.3)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--accum-steps", type=int, default=None,
                   help="average this many micro-batch grads per optimizer "
                        "update. LR decay epochs are honored regardless; "
                        "NOTE --max-steps, checkpoint cadence, and "
                        "log_every count MICRO-steps, and N accum-steps "
                        "means N× fewer optimizer updates per epoch")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--feature-dir", default=None)
    p.add_argument("--feature-fps", type=float, default=None,
                   help="feature rows per second of video (extraction "
                        "rate); unset configs assume 1.0 with a warning — "
                        "seconds outputs scale by this")
    p.add_argument("--annotation-path", default=None)
    p.add_argument("--glove-path", default=None)
    p.add_argument("--num-workers", type=int, default=None,
                   help=">0 uses Grain worker processes for the host pipeline")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--init-from", default=None,
                   help="stage-1 checkpoint dir for stage-2 init")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--allow-config-mismatch", action="store_true",
                   help="downgrade the checkpoint-vs-active config parity "
                        "check (resume / --init-from) to a warning")
    p.add_argument("--model-axis", type=int, default=None,
                   help="TP axis size; data axis gets the rest "
                        "(default: the config's MeshConfig.model_axis)")
    p.add_argument("--time-axis", type=int, default=None,
                   help="SP axis size: shard the clip axis (long grids; "
                        "default: the config's MeshConfig.time_axis)")
    p.add_argument("--tensorboard-dir", default=None)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() from env "
                        "(the torch.distributed.launch equivalent)")
    p.add_argument("--preflight", action="store_true",
                   help="run the dataset validator (drn_tpu.data.validate) "
                        "on the train split before touching the "
                        "accelerator; exit non-zero on anything a run "
                        "would crash on or silently mis-scale")
    p.add_argument("--preflight-sample", type=int, default=200,
                   help="feature files sampled by --preflight")
    p.add_argument("--device-features", action="store_true",
                   help="stage each unique video's resampled features "
                        "into one device-resident table before training "
                        "(V*num_clips*F*4 bytes of HBM) — epochs then "
                        "read nothing from disk (operations.md §6; "
                        "single-process runs only)")
    args = p.parse_args(argv)

    from drn_tpu.utils import enable_jit_cache

    enable_jit_cache()
    if args.distributed:
        jax.distributed.initialize()

    cfg = get_config(args.config)
    tr, da = {}, {}
    if args.stage is not None:
        tr["stage"] = args.stage
    if args.stage2_iou_only and args.stage2_joint:
        p.error("--stage2-iou-only and --stage2-joint are mutually "
                "exclusive")
    if args.stage2_iou_only:
        tr["stage2_iou_only"] = True
        # make_optimizer gates the freeze on stage >= 2; without this
        # check a forgotten --stage 2 would silently fine-tune the WHOLE
        # network under the stage-1 loss.
        if tr.get("stage", cfg.train.stage) < 2:
            p.error("--stage2-iou-only requires --stage 2 (the freeze "
                    "only applies to stage-2 training)")
    if args.stage2_joint:
        tr["stage2_iou_only"] = False
    if args.accum_steps is not None:
        tr["accum_steps"] = args.accum_steps
    if args.epochs is not None:
        tr["num_epochs"] = args.epochs
    if args.lr is not None:
        tr["learning_rate"] = args.lr
    if args.checkpoint_dir is not None:
        tr["checkpoint_dir"] = args.checkpoint_dir
    if args.tensorboard_dir is not None:
        tr["tensorboard_dir"] = args.tensorboard_dir
    if args.batch_size is not None:
        da["batch_size"] = args.batch_size
    if args.feature_dir is not None:
        da["feature_dir"] = args.feature_dir
    if args.feature_fps is not None:
        da["feature_fps"] = args.feature_fps
    if args.annotation_path is not None:
        da["annotation_path"] = args.annotation_path
    if args.glove_path is not None:
        da["glove_path"] = args.glove_path
    if args.num_workers is not None:
        da["num_workers"] = args.num_workers
    if tr:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **tr))
    if da:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **da))

    if args.preflight:
        # Fail before any compile/init time is spent. Only the train split
        # gates the run hard — a missing val file merely skips periodic
        # eval (see _make_val_eval), so it must not block training here.
        if cfg.data.dataset == "synthetic":
            print("[preflight] synthetic dataset — nothing to validate",
                  file=sys.stderr)
        else:
            from drn_tpu.data.validate import validate

            report = validate(cfg, splits=("train",),
                              sample=args.preflight_sample)
            for rep in report.get("splits", []):
                for w in rep["warnings"]:
                    print(f"[preflight][{rep['split']}] WARN: {w}",
                          file=sys.stderr)
                for e in rep["errors"]:
                    print(f"[preflight][{rep['split']}] ERROR: {e}",
                          file=sys.stderr)
            for e in report.get("errors", []):
                print(f"[preflight] ERROR: {e}", file=sys.stderr)
            if not report["ok"]:
                raise SystemExit(
                    "preflight validation failed — fix the data errors "
                    "above (or rerun without --preflight)")
            print("[preflight] ok", file=sys.stderr)

    model_axis = (args.model_axis if args.model_axis is not None
                  else cfg.mesh.model_axis)
    time_axis = (args.time_axis if args.time_axis is not None
                 else cfg.mesh.time_axis)
    mesh = (make_mesh(model_axis=model_axis, time_axis=time_axis)
            if len(jax.devices()) > 1 else None)
    guard = PreemptionGuard().install()
    train(cfg, mesh=mesh, init_from=args.init_from, max_steps=args.max_steps,
          preemption_guard=guard,
          allow_config_mismatch=args.allow_config_mismatch,
          device_features=args.device_features)
    guard.uninstall()
    if guard.triggered:
        # EX_TEMPFAIL: the checkpoint is saved; a restart loop should
        # resubmit with --resume (which is the config default).
        print("preempted: state saved; rerun to resume", file=sys.stderr)
        sys.exit(exit_code_for(guard))


if __name__ == "__main__":
    main()

"""Multi-seed TRAINED-head rescore at production width (VERDICT r4 items 1+2).

Round 4 left the flagship recipe evidence statistically one-sided: the
untrained-IoU-head control got a 6-seed jitter probe (R@1-mean 24.4-39.8,
logs/recipe_untrained_rescore_probe_r4.log) but the trained-head treatment
was a single seed (+2.64 R@1) sitting inside that band. This script makes
the demonstration symmetric — and PAIRED:

  stage 1 trained ONCE (one checkpoint, fixed task),
  then for each seed s:
    - re-init ONLY the IoU-head subtree from key(s)      (same perturbation
      the control probe applied)
    - eval rescore with the UNTRAINED head               (control, paired)
    - train stage 2 (IoU-only freeze, data order also seeded by s)
    - eval rescore with the TRAINED head                 (treatment, paired)

Pairing by seed turns the control band from "context" into a per-seed
difference: trained_minus_untrained(s) isolates what TRAINING the head adds
on top of the same random init. The JSON reports per-seed values, means,
spans, and the paired deltas.

Optionally sweeps the rescore blend exponent w (EvalConfig.score_iou_weight,
score = sigmoid(match)·sigmoid(iou)^w) on each trained head — the knob that
trades the R@1 gain against the R@5 cost rescoring showed at w=1.

Resumable: state lands in <workdir>/treatment_state.json after every eval,
and finished stages/seeds are skipped on re-run (the relay drops requests —
CLAUDE.md "Environment gotchas").

    python scripts/recipe_treatment_seeds.py \
        --config synthetic_recipe_flagship --seeds 4 \
        --w-sweep 0.25,0.5,0.75 --workdir /tmp/drn_treatment
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.time()


def _log(msg):
    print(f"[treatment +{time.time() - _T0:7.1f}s] {msg}", flush=True)


def _state_path(workdir):
    return os.path.join(workdir, "treatment_state.json")


def _load_state(workdir):
    try:
        with open(_state_path(workdir)) as f:
            return json.load(f)
    except (FileNotFoundError, ValueError):
        return {"rows": {}}


def _save_state(workdir, state):
    tmp = _state_path(workdir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, _state_path(workdir))


def _eval_row(cfg, model, params, *, rescore, w=1.0):
    from drn_tpu.evaluate import evaluate

    c = cfg.replace(eval=dataclasses.replace(
        cfg.eval, score_use_iou_head=rescore, score_iou_weight=w))
    return {k: round(v, 4)
            for k, v in evaluate(c, model, params, split="val").items()}


def r1_mean(r):
    vals = [v for k, v in r.items() if k.startswith("R@1")]
    return sum(vals) / len(vals)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="paired multi-seed trained-vs-untrained rescore")
    p.add_argument("--config", default="synthetic_recipe_flagship")
    p.add_argument("--seeds", type=int, default=4)
    p.add_argument("--seed-start", type=int, default=0)
    p.add_argument("--stage1-seed", type=int, default=0)
    p.add_argument("--stage2-epochs", type=int, default=None)
    p.add_argument("--w-sweep", default="",
                   help="comma-separated extra blend exponents w to eval "
                        "each TRAINED head at (w=1 always evaluated)")
    p.add_argument("--workdir", required=True,
                   help="persistent dir: stage-1 checkpoint, per-seed "
                        "stage-2 checkpoints, and the resumable state file")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (see scripts/recipe_demo.py)")
    args = p.parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from drn_tpu.config import get_config
    from drn_tpu.train import build_model, init_params, train
    from drn_tpu.utils import enable_jit_cache
    from drn_tpu.utils.checkpoint import CheckpointManager, prefer_best_dir

    enable_jit_cache()
    os.makedirs(args.workdir, exist_ok=True)
    state = _load_state(args.workdir)
    rows = state["rows"]
    cfg = get_config(args.config)
    # Pin in-training val selection to w=1 (what the committed r5 logs
    # ran with, pre-w=0.25 default); every summary row passes its own w
    # to _eval_row explicitly, so the sweep itself is unaffected.
    cfg = cfg.replace(eval=dataclasses.replace(cfg.eval,
                                               score_iou_weight=1.0))
    model = build_model(cfg)  # ONE model → eval-step cache reuse across rows
    w_extra = [float(w) for w in args.w_sweep.split(",") if w.strip()]

    def best_params(ckpt_dir):
        import jax as _jax

        template = init_params(cfg, model, _jax.random.key(0))
        ckpt = CheckpointManager(prefer_best_dir(ckpt_dir))
        restored = ckpt.restore({"params": template}, partial=True)
        ckpt.close()
        assert restored is not None, f"no checkpoint in {ckpt_dir}"
        return restored["params"]

    # ---- stage 1: once, shared by every seed -------------------------
    stage1_dir = f"{args.workdir}/{cfg.name}/stage1"
    if not os.path.isdir(os.path.join(stage1_dir, "best")):
        _log(f"stage 1 (seed {args.stage1_seed}) → {stage1_dir}")
        cfg1 = cfg.replace(
            train=dataclasses.replace(
                cfg.train, stage=1, checkpoint_dir=args.workdir,
                resume=False, seed=args.stage1_seed),
            # model selection on the PURE match score (recipe_demo.py)
            eval=dataclasses.replace(cfg.eval, score_use_iou_head=False),
        )
        train(cfg1)
    else:
        _log(f"stage 1 checkpoint found in {stage1_dir}; reusing")
    params1 = best_params(stage1_dir)

    if "baseline_plain" not in rows:
        rows["baseline_plain"] = _eval_row(cfg, model, params1,
                                           rescore=False)
        _save_state(args.workdir, state)
    _log(f"baseline (no rescore): "
         f"R@1-mean {r1_mean(rows['baseline_plain']):.2f}")

    # ---- per-seed: paired untrained control + trained treatment ------
    for seed in range(args.seed_start, args.seeds):
        # Each in-process train()+evaluate() cycle at flagship width
        # leaves compiled executables + their constants live; ~8 cycles
        # once hit 131 GB RSS and the OOM killer (r5). State-resumable
        # anyway, but don't make the kernel do the cleanup.
        jax.clear_caches()
        tag_u, tag_t = f"untrained_seed{seed}", f"trained_seed{seed}"
        seed_root = f"{args.workdir}/seed{seed}"
        variant_dir = f"{seed_root}/stage1_variant"
        stage2_dir = f"{seed_root}/{cfg.name}/stage2"

        need_train = not os.path.isdir(os.path.join(stage2_dir, "best"))
        if tag_u not in rows or need_train:
            # stage-1 params with ONLY the IoU head re-initialized from
            # key(seed) — the exact perturbation of the r4 control probe
            fresh = init_params(cfg, model, jax.random.key(seed))
            pseed = {
                **params1,
                "params": {**params1["params"],
                           "iou_head": fresh["params"]["iou_head"]},
            }
            if tag_u not in rows:
                rows[tag_u] = _eval_row(cfg, model, pseed, rescore=True)
                _save_state(args.workdir, state)
                _log(f"seed {seed} control (untrained head): "
                     f"R@1-mean {r1_mean(rows[tag_u]):.2f}")
            if need_train:
                # persist the variant as the stage-2 init source
                ck = CheckpointManager(variant_dir)
                ck.save(0, {"params": jax.device_get(pseed)}, force=True)
                ck.wait()
                ck.close()
                cfg2 = cfg.replace(train=dataclasses.replace(
                    cfg.train, stage=2, stage2_iou_only=True,
                    checkpoint_dir=seed_root, resume=False, seed=seed,
                    **({"num_epochs": args.stage2_epochs}
                       if args.stage2_epochs else {}),
                ))
                _log(f"seed {seed} stage 2 ({cfg2.train.num_epochs} epochs, "
                     f"IoU-only) → {stage2_dir}")
                train(cfg2, init_from=variant_dir)
        params2 = best_params(stage2_dir)
        if tag_t not in rows:
            rows[tag_t] = _eval_row(cfg, model, params2, rescore=True)
            _save_state(args.workdir, state)
        _log(f"seed {seed} treatment (trained head):  "
             f"R@1-mean {r1_mean(rows[tag_t]):.2f}")
        for w in w_extra:
            tag_w = f"trained_seed{seed}_w{w:g}"
            if tag_w not in rows:
                rows[tag_w] = _eval_row(cfg, model, params2,
                                        rescore=True, w=w)
                _save_state(args.workdir, state)
            _log(f"seed {seed} trained @ w={w:g}: "
                 f"R@1-mean {r1_mean(rows[tag_w]):.2f}  "
                 f"R@5,0.5={rows[tag_w].get('R@5,IoU=0.5', float('nan')):.2f}")

    # ---- summary ------------------------------------------------------
    # Aggregate every seed present in state, not just this invocation's
    # range — a resumed run (--seed-start N) must still report the full
    # multi-seed table (learned the hard way: the r5 OOM-resume printed a
    # seeds=[3] aggregate even though state held seeds 0-3).
    seeds = sorted(s for s in range(max(args.seeds, 64))
                   if f"trained_seed{s}" in rows
                   and f"untrained_seed{s}" in rows)
    u = [r1_mean(rows[f"untrained_seed{s}"]) for s in seeds]
    t = [r1_mean(rows[f"trained_seed{s}"]) for s in seeds]
    base = r1_mean(rows["baseline_plain"])
    paired = [round(b - a, 2) for a, b in zip(u, t)]

    metrics = sorted(rows["baseline_plain"])
    print("\n| row | " + " | ".join(metrics) + " |")
    print("|" + "|".join("---" for _ in range(len(metrics) + 1)) + "|")
    for tag in (["baseline_plain"]
                + [f"untrained_seed{s}" for s in seeds]
                + [f"trained_seed{s}" for s in seeds]
                + [f"trained_seed{s}_w{w:g}" for s in seeds
                   for w in w_extra if f"trained_seed{s}_w{w:g}" in rows]):
        print("| " + " | ".join(
            [tag] + [f"{rows[tag][m]:.2f}" for m in metrics]) + " |")

    print()
    print(json.dumps({
        "probe": "paired_trained_vs_untrained_rescore",
        "config": args.config,
        "seeds": seeds,
        "baseline_plain_r1_mean": round(base, 2),
        "untrained_r1_means": [round(v, 2) for v in u],
        "trained_r1_means": [round(v, 2) for v in t],
        "untrained_mean": round(sum(u) / len(u), 2),
        "trained_mean": round(sum(t) / len(t), 2),
        "untrained_span": [round(min(u), 2), round(max(u), 2)],
        "trained_span": [round(min(t), 2), round(max(t), 2)],
        "paired_trained_minus_untrained": paired,
        "trained_minus_baseline": [round(v - base, 2) for v in t],
        "w_sweep": {
            f"w{w:g}": {
                "r1_means": [round(r1_mean(
                    rows[f"trained_seed{s}_w{w:g}"]), 2) for s in seeds
                    if f"trained_seed{s}_w{w:g}" in rows],
                "r5_05": [rows[f"trained_seed{s}_w{w:g}"].get("R@5,IoU=0.5")
                          for s in seeds
                          if f"trained_seed{s}_w{w:g}" in rows],
            } for w in w_extra
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Stage-2 regime A/B: IoU-only freeze vs joint fine-tune (VERDICT r4 item 7).

SURVEY §4.2 marks the reference's stage-2 freezing details MEDIUM
confidence — "possibly joint fine-tune with lower LR". Both paths exist
(`TrainConfig.stage2_iou_only`); until round 5 only the freeze was ever
demonstrated. This A/B trains stage 1 once, then runs three stage-2
regimes from the SAME stage-1 best checkpoint, over several seeds:

    freeze      — IoU head only, base LR      (the demonstrated recipe)
    joint       — everything, base LR
    joint_lowlr — everything, base LR × 0.1   (the SURVEY hypothesis)

Each regime is judged on the held-out val split with rescoring (w=1) by
R@1-mean and R@5,IoU=0.5; `stage2_plain` rows (no rescore) expose whether
joint fine-tuning moved the grounding heads themselves.

Resumable like scripts/recipe_treatment_seeds.py (state JSON per workdir).

    python scripts/stage2_regime_ab.py --config synthetic_recipe \
        --seeds 3 --workdir /tmp/drn_regime_ab --cpu
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
    print(f"[regime_ab +{time.time() - _T0:7.1f}s] {msg}", flush=True)


REGIMES = {
    "freeze": dict(stage2_iou_only=True, lr_scale=1.0),
    "joint": dict(stage2_iou_only=False, lr_scale=1.0),
    "joint_lowlr": dict(stage2_iou_only=False, lr_scale=0.1),
}


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="stage-2 regime A/B")
    p.add_argument("--config", default="synthetic_recipe")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--stage2-epochs", type=int, default=None)
    p.add_argument("--workdir", required=True)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from drn_tpu.config import get_config
    from drn_tpu.evaluate import evaluate
    from drn_tpu.train import build_model, init_params, train
    from drn_tpu.utils import enable_jit_cache
    from drn_tpu.utils.checkpoint import CheckpointManager, prefer_best_dir

    enable_jit_cache()
    os.makedirs(args.workdir, exist_ok=True)
    state_path = os.path.join(args.workdir, "regime_ab_state.json")
    try:
        with open(state_path) as f:
            rows = json.load(f)
    except (FileNotFoundError, ValueError):
        rows = {}

    def save_rows():
        with open(state_path + ".tmp", "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)
        os.replace(state_path + ".tmp", state_path)

    cfg = get_config(args.config)
    # w=1 (reference-exact product): the committed regime A/B that set
    # the stage2_iou_only default (design.md §4.3) ran before the blend
    # default moved to w=0.25 — keep the A/B regenerable as logged.
    cfg = cfg.replace(eval=dataclasses.replace(cfg.eval,
                                               score_iou_weight=1.0))
    model = build_model(cfg)

    def best_params(ckpt_dir):
        template = init_params(cfg, model, jax.random.key(0))
        ckpt = CheckpointManager(prefer_best_dir(ckpt_dir))
        restored = ckpt.restore({"params": template}, partial=True)
        ckpt.close()
        assert restored is not None, f"no checkpoint in {ckpt_dir}"
        return restored["params"]

    def eval_row(params, rescore):
        c = cfg.replace(eval=dataclasses.replace(
            cfg.eval, score_use_iou_head=rescore))
        return {k: round(v, 4)
                for k, v in evaluate(c, model, params, split="val").items()}

    def r1_mean(r):
        vals = [v for k, v in r.items() if k.startswith("R@1")]
        return sum(vals) / len(vals)

    stage1_dir = f"{args.workdir}/{cfg.name}/stage1"
    if not os.path.isdir(os.path.join(stage1_dir, "best")):
        _log(f"stage 1 → {stage1_dir}")
        train(cfg.replace(
            train=dataclasses.replace(cfg.train, stage=1,
                                      checkpoint_dir=args.workdir,
                                      resume=False, seed=0),
            eval=dataclasses.replace(cfg.eval, score_use_iou_head=False),
        ))
    params1 = best_params(stage1_dir)
    if "stage1_plain" not in rows:
        rows["stage1_plain"] = eval_row(params1, rescore=False)
        save_rows()
    _log(f"stage1 baseline R@1-mean {r1_mean(rows['stage1_plain']):.2f}")

    for seed in range(args.seeds):
        # Drop compiled executables between seeds — repeated in-process
        # train()+evaluate() cycles leak executables/constants and once
        # OOM-killed the treatment probe at 131 GB RSS (r5).
        jax.clear_caches()
        for name, r in REGIMES.items():
            tag = f"{name}_seed{seed}"
            run_root = f"{args.workdir}/{tag}"
            stage2_dir = f"{run_root}/{cfg.name}/stage2"
            if not os.path.isdir(os.path.join(stage2_dir, "best")):
                _log(f"{tag}: stage 2 (iou_only={r['stage2_iou_only']}, "
                     f"lr×{r['lr_scale']})")
                cfg2 = cfg.replace(train=dataclasses.replace(
                    cfg.train, stage=2,
                    stage2_iou_only=r["stage2_iou_only"],
                    learning_rate=cfg.train.learning_rate * r["lr_scale"],
                    checkpoint_dir=run_root, resume=False, seed=seed,
                    **({"num_epochs": args.stage2_epochs}
                       if args.stage2_epochs else {}),
                ))
                train(cfg2, init_from=stage1_dir)
            params2 = best_params(stage2_dir)
            if tag not in rows:
                rows[tag] = eval_row(params2, rescore=True)
                rows[tag + "_plain"] = eval_row(params2, rescore=False)
                save_rows()
            _log(f"{tag}: rescored R@1-mean {r1_mean(rows[tag]):.2f}  "
                 f"plain {r1_mean(rows[tag + '_plain']):.2f}")

    metrics = sorted(rows["stage1_plain"])
    print("\n| row | " + " | ".join(metrics) + " |")
    print("|" + "|".join("---" for _ in range(len(metrics) + 1)) + "|")
    for tag in sorted(rows):
        print("| " + " | ".join(
            [tag] + [f"{rows[tag][m]:.2f}" for m in metrics]) + " |")

    summary = {"probe": "stage2_regime_ab", "config": args.config,
               "stage1_r1_mean": round(r1_mean(rows["stage1_plain"]), 2)}
    for name in REGIMES:
        vals = [r1_mean(rows[f"{name}_seed{s}"])
                for s in range(args.seeds) if f"{name}_seed{s}" in rows]
        r5 = [rows[f"{name}_seed{s}"].get("R@5,IoU=0.5")
              for s in range(args.seeds) if f"{name}_seed{s}" in rows]
        summary[name] = {
            "r1_means": [round(v, 2) for v in vals],
            "r1_mean_of_means": round(sum(vals) / len(vals), 2),
            "r5_05": r5,
        }
    print()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())

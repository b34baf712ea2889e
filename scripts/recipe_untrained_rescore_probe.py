"""How much of the UNTRAINED-IoU-head rescore row is seed luck?

Motivation (logs/recipe_demo_flagship_r4.log): at production width
(synthetic_recipe_flagship, hidden 512) the recipe demo's sanity row —
rescoring stage-1 output with a randomly initialized IoU head — landed
ABOVE the trained stage-2 head (mIoU 41.9 vs 40.8), where at width 128
it behaved as expected (40.2 untrained < 41.3 trained,
logs/recipe_demo_r4.log). Before writing that up as a property of the
mechanism we need to know whether the untrained gain is structural or a
lottery over head inits: rescoring multiplies near-tie match scores by
sigmoid of a random projection of the sampled features, so its effect
on ranking is a random perturbation whose sign cannot be constant.

This probe holds the stage-1 checkpoint fixed and re-initializes ONLY
the IoU head subtree across N seeds, re-running the full val eval with
rescoring each time. A wide spread (some seeds at/below the no-rescore
baseline) = ranking jitter that happened to win at seed 0; a tight
spread above the trained head = structural, and the write-up must say
the trained head adds nothing at this width.

Usage (after a recipe_demo run left its workdir around):

    python scripts/recipe_untrained_rescore_probe.py \
        --workdir /tmp/drn_recipe_XXXX/synthetic_recipe_flagship/stage1 \
        --config synthetic_recipe_flagship --seeds 6

Results land in logs/recipe_demo_flagship_r4.log's provenance note
(logs/README.md).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="seed-spread of the untrained-IoU-head rescore")
    p.add_argument("--workdir", required=True,
                   help="stage-1 checkpoint dir from scripts/recipe_demo.py")
    p.add_argument("--config", default="synthetic_recipe_flagship")
    p.add_argument("--seeds", type=int, default=6)
    p.add_argument("--seed-start", type=int, default=0,
                   help="first seed (resume a relay-dropped run without "
                        "re-evaluating the seeds already measured)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (see scripts/recipe_demo.py)")
    args = p.parse_args(argv)
    if args.seed_start >= args.seeds:
        p.error(f"--seed-start {args.seed_start} >= --seeds {args.seeds}: "
                f"empty seed range (--seeds is the EXCLUSIVE end bound, "
                f"not a count)")
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import importlib.util

    import jax

    from drn_tpu.config import get_config
    from drn_tpu.evaluate import evaluate
    from drn_tpu.train import build_model, init_params

    # scripts/ is not a package — load the demo helpers by file path,
    # exactly as tests/test_recipe.py does.
    spec = importlib.util.spec_from_file_location(
        "recipe_demo",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "recipe_demo.py"))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    _best_params, r1_mean = demo._best_params, demo.r1_mean

    t0 = time.time()
    cfg = get_config(args.config)
    # w=1 (reference-exact product): this probe's committed jitter band
    # predates the w=0.25 default (design.md §4.4) and must stay
    # regenerable as logged.
    cfg = cfg.replace(eval=dataclasses.replace(cfg.eval,
                                               score_iou_weight=1.0))
    params = _best_params(cfg, args.workdir)  # stage-1 best-on-val

    # One model + one config per rescore flag so the jitted eval step is
    # compiled once and reused across every seed (evaluate's step cache).
    cfg_plain = cfg.replace(
        eval=dataclasses.replace(cfg.eval, score_use_iou_head=False))
    cfg_rescore = cfg.replace(
        eval=dataclasses.replace(cfg.eval, score_use_iou_head=True))
    model_plain = build_model(cfg_plain)
    model_rescore = build_model(cfg_rescore)

    def log(tag, r):
        print(f"[probe +{time.time() - t0:6.1f}s] {tag}: "
              + "  ".join(f"{k}={r[k]:.2f}" for k in sorted(r)
                          if k.startswith("R@1") or k == "mIoU"),
              flush=True)

    rows = {}
    rows["stage1_plain"] = evaluate(cfg_plain, model_plain, params,
                                    split="val")
    log("stage1, no rescore", rows["stage1_plain"])

    for seed in range(args.seed_start, args.seeds):
        fresh = init_params(cfg, model_rescore, jax.random.key(seed))
        pseed = {
            **params,
            "params": {**params["params"],
                       "iou_head": fresh["params"]["iou_head"]},
        }
        rows[f"untrained_seed{seed}"] = evaluate(
            cfg_rescore, model_rescore, pseed, split="val")
        log(f"rescore, untrained head seed {seed}",
            rows[f"untrained_seed{seed}"])

    means = {k: r1_mean(r) for k, r in rows.items()}
    seed_means = [v for k, v in means.items() if k.startswith("untrained")]
    print(json.dumps({
        "probe": "untrained_rescore_seed_spread",
        "config": args.config,
        "stage1_plain_r1_mean": round(means["stage1_plain"], 2),
        "untrained_r1_means": [round(v, 2) for v in seed_means],
        "spread": round(max(seed_means) - min(seed_means), 2),
        "results": {k: {m: round(v, 2) for m, v in r.items()}
                    for k, r in rows.items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""At-scale functional validation on real hardware (reproducible form of
the round-1 experiment recorded in README "Functional validation").

Flagship width (hidden 512, C3D 4096-d features, T=64), synthetic
512-train / 128-held-out: train stage 1, evaluate held-out recall with
matching-only scoring, train stage 2 (IoU head only, frozen trunk),
re-evaluate with IoU rescoring. Checks the DRN paper's central mechanism
(rescoring lifts R@1) and that the stage-2 freeze leaves stage-1 params
bit-identical.

    python scripts/atscale_synthetic.py [--epochs1 60 --epochs2 40]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/drn_tpu_jit_cache")

import jax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs1", type=int, default=60)
    p.add_argument("--epochs2", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=64)
    args = p.parse_args()

    from drn_tpu.config import get_config
    from drn_tpu.data.pipeline import BatchIterator
    from drn_tpu.data.synthetic import SyntheticDataset
    from drn_tpu.evaluate import evaluate
    from drn_tpu.train import (build_model, init_state, make_optimizer,
                               make_train_step)

    base = get_config("charades_c3d")  # width 512, C3D 4096, T=64
    base = base.replace(
        data=dataclasses.replace(base.data, dataset="synthetic",
                                 batch_size=args.batch_size),
        # score_iou_weight pinned to the w=1 reference-exact product the
        # committed at-scale logs were produced with (pre-w=0.25 default).
        eval=dataclasses.replace(base.eval, batch_size=64,
                                 score_iou_weight=1.0),
    )
    ds_train = SyntheticDataset(base.data, base.model, split="train",
                                num_examples=512)
    ds_test = SyntheticDataset(base.data, base.model, split="test",
                               num_examples=128)
    model = build_model(base)

    def run_stage(cfg, params, epochs, tag):
        batches = BatchIterator(ds_train, cfg.data.batch_size, shuffle=True,
                                seed=0)
        tx = make_optimizer(cfg, len(batches))
        state = init_state(cfg, model, tx, jax.random.key(0))
        if params is not None:
            state = state.replace(params=params)
        step = make_train_step(cfg, model, mesh=None)
        for e in range(epochs):
            for batch in batches.epoch(e):
                state, m = step(state, {k: jax.numpy.asarray(v)
                                        for k, v in batch.items()})
            if (e + 1) % 10 == 0:
                log(f"{tag} epoch {e + 1}: " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in sorted(m.items())))
        return state.params

    s1_cfg = base.replace(train=dataclasses.replace(base.train, stage=1))
    params1 = run_stage(s1_cfg, None, args.epochs1, "stage1")
    # Host snapshot: the stage-2 train step DONATES its state, deleting
    # params1's device buffers on the first step.
    params1_host = jax.device_get(params1)

    eval_match = base.replace(eval=dataclasses.replace(
        base.eval, score_use_iou_head=False))
    r_match = evaluate(eval_match, model, params1, dataset=ds_test)
    log("stage1 (match-only scoring): "
        + " ".join(f"{k}={v:.1f}" for k, v in sorted(r_match.items())))

    s2_cfg = base.replace(train=dataclasses.replace(
        base.train, stage=2, stage2_iou_only=True))
    params2 = run_stage(s2_cfg, params1, args.epochs2, "stage2")

    # The IoU-only freeze must leave every non-IoU-head param bit-identical.
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(params1_host),
        jax.tree_util.tree_leaves(params2),
    ):
        key = jax.tree_util.keystr(path)
        if "iou_head" not in key:
            assert np.array_equal(np.asarray(a), np.asarray(b)), key
    log("stage-2 freeze verified: non-IoU params bit-identical")

    eval_iou = base.replace(eval=dataclasses.replace(
        base.eval, score_use_iou_head=True))
    r_iou = evaluate(eval_iou, model, params2, dataset=ds_test)
    log("stage2 (IoU rescoring):      "
        + " ".join(f"{k}={v:.1f}" for k, v in sorted(r_iou.items())))

    lift = {k: r_iou[k] - r_match[k] for k in r_match}
    log("lift: " + " ".join(f"{k}={v:+.1f}" for k, v in sorted(lift.items())))
    assert r_iou["R@1,IoU=0.5"] > r_match["R@1,IoU=0.5"], (
        "IoU rescoring did not lift R@1,IoU=0.5"
    )
    print("ATSCALE OK")


if __name__ == "__main__":
    main()

"""Train-step breakdown on TPU: loss forward vs +backward vs +Adam, B=384.

    python scripts/train_probe.py [--batch-size 384]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/drn_tpu_jit_cache")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained_time(run_k, iters=12, warmup=2, reps=5):
    def timed(k):
        for _ in range(warmup):
            run_k(k)
        s = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_k(k)
            s.append(time.perf_counter() - t0)
        s.sort()
        return s[len(s) // 2]

    t1, t2 = timed(1), timed(1 + iters)
    return max((t2 - t1) / iters, 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=384)
    args = p.parse_args()

    from bench import make_bench_batch
    from drn_tpu.config import get_config
    from drn_tpu.models.drn import location_metadata
    from drn_tpu.models.losses import drn_loss
    from drn_tpu.train import build_model, init_state, make_optimizer

    cfg = get_config("charades_c3d_batched_eval")
    batch = make_bench_batch(cfg, batch_size=args.batch_size)
    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 1), jax.random.key(0))
    locs, _, level_ids = location_metadata(cfg.model, cfg.data.num_clips)
    base = cfg.data.num_clips

    def loss_fn(params, b):
        out = model.apply(params, b["features"], b["word_ids"],
                          b["query_mask"])
        loss, metrics = drn_loss(cfg.model, cfg.train, out, locs, level_ids,
                                 b["gt_grid"], base, b["valid"])
        return loss

    def chain(body):
        @partial(jax.jit, static_argnames="kk")
        def run(state, b, kk):
            def f(i, carry):
                state, s = carry
                b2 = dict(b)
                b2["features"] = b["features"] + s * 0.0
                state, out = body(state, b2)
                return state, jax.lax.optimization_barrier(jnp.float32(out))

            _, s = jax.lax.fori_loop(0, kk, f, (state, jnp.float32(0)))
            return s

        return lambda kk: float(run(state, batch, kk))

    # 1) loss forward only
    t = chained_time(chain(lambda st, b: (st, loss_fn(st.params, b))))
    log(f"loss fwd only       : {t * 1e3:7.3f} ms")

    # 2) fwd + bwd (grads consumed, no update)
    def fwdbwd(st, b):
        loss, grads = jax.value_and_grad(loss_fn)(st.params, b)
        gsum = sum(jnp.sum(g).astype(jnp.float32)
                   for g in jax.tree_util.tree_leaves(grads))
        return st, loss + 1e-9 * gsum

    t = chained_time(chain(fwdbwd))
    log(f"fwd + bwd           : {t * 1e3:7.3f} ms")

    # 3) full step (fwd + bwd + clip + Adam)
    def full(st, b):
        loss, grads = jax.value_and_grad(loss_fn)(st.params, b)
        st = st.apply_gradients(grads=grads)
        return st, loss

    t = chained_time(chain(full))
    log(f"fwd + bwd + Adam    : {t * 1e3:7.3f} ms")

    # 4) bwd attribution: freeze one submodule's params via stop_gradient
    # (the first-layer modules' inputs are non-differentiable, so freezing
    # a subtree removes its whole backward slice); the delta vs full
    # fwd+bwd is that module's bwd cost.
    def frozen_loss(names):
        def fn(params, b):
            inner = dict(params["params"])
            for n in names:
                inner[n] = jax.tree.map(jax.lax.stop_gradient, inner[n])
            return loss_fn({"params": inner}, b)

        return fn

    groups = {
        "query_encoder": ["query_encoder"],
        "backbone": ["backbone"],
        "fusion+fpn": ["fusion_0", "fusion_1", "fusion_2", "fpn"],
        "heads": ["heads"],
        "iou_head": ["iou_head"],
    }
    for name, subtrees in groups.items():
        lf = frozen_loss(subtrees)

        def fwdbwd_frozen(st, b, lf=lf):
            loss, grads = jax.value_and_grad(lf)(st.params, b)
            gsum = sum(jnp.sum(g).astype(jnp.float32)
                       for g in jax.tree_util.tree_leaves(grads))
            return st, loss + 1e-9 * gsum

        t = chained_time(chain(fwdbwd_frozen))
        log(f"fwd+bwd w/o {name:13s}: {t * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()

"""Component-level device timing on the real TPU (chained-jit method).

Times the full eval step and isolated submodules (query encoder, backbone)
at flagship shapes to locate where the step time goes — the profiling step
SURVEY.md §8 prescribes before kernel work. Run:

    python scripts/profile_components.py [--config charades_c3d_batched_eval]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained_time(run_k, iters=12, warmup=2, reps=5):
    def timed(k):
        for _ in range(warmup):
            run_k(k)
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_k(k)
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return samples[len(samples) // 2]

    t1 = timed(1)
    t2 = timed(1 + iters)
    return max((t2 - t1) / iters, 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="charades_c3d_batched_eval")
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/drn_tpu_jit_cache")

    import jax
    import jax.numpy as jnp

    from bench import make_bench_batch
    from drn_tpu.config import get_config
    from drn_tpu.evaluate import make_eval_step
    from drn_tpu.models.backbone import Backbone
    from drn_tpu.models.query_encoder import QueryEncoder
    from drn_tpu.train import build_model, init_state, make_optimizer

    cfg = get_config(args.config)
    batch = make_bench_batch(cfg)
    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 1), jax.random.key(0))
    params = state.params

    def consume(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l).astype(jnp.float32) for l in leaves) * 1e-6

    results = {}

    def measure(name, run_k):
        results[name] = chained_time(run_k, args.iters)
        log(f"{name:20s} {results[name] * 1e3:8.3f} ms")

    # 1) full eval step (forward + decode + NMS + recall)
    step = make_eval_step(cfg, model)

    @partial(jax.jit, static_argnames="k")
    def full_run(p, b, k):
        def body(i, s):
            b2 = dict(b)
            b2["features"] = b["features"] + s * 0.0
            return jax.lax.optimization_barrier(consume(step(p, b2)))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    measure("eval_step", lambda k: float(full_run(params, batch, k)))

    # 2) bare model forward
    @partial(jax.jit, static_argnames="k")
    def fwd_run(p, b, k):
        def body(i, s):
            out = model.apply(p, b["features"] + s * 0.0, b["word_ids"],
                              b["query_mask"])
            return jax.lax.optimization_barrier(consume(out))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    measure("model_forward", lambda k: float(fwd_run(params, batch, k)))

    # 3) query encoder alone (perturb via the mask → embeddings stay live)
    enc = QueryEncoder(cfg.model)
    enc_params = {"params": params["params"]["query_encoder"]}

    @partial(jax.jit, static_argnames="k")
    def enc_run(p, b, k):
        def body(i, s):
            m = b["query_mask"] & (s < 1e9)  # data dependence on carry
            return jax.lax.optimization_barrier(
                consume(enc.apply(p, b["word_ids"], m))
            )

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    measure("query_encoder", lambda k: float(enc_run(enc_params, batch, k)))

    # 4) backbone alone
    bb = Backbone(cfg.model)
    bb_params = {"params": params["params"]["backbone"]}

    @partial(jax.jit, static_argnames="k")
    def bb_run(p, b, k):
        def body(i, s):
            return jax.lax.optimization_barrier(
                consume(bb.apply(p, b["features"] + s * 0.0))
            )

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    measure("backbone", lambda k: float(bb_run(bb_params, batch, k)))

    log(f"residual (fusion+fpn+heads+iou): "
        f"{(results['model_forward'] - results['query_encoder'] - results['backbone']) * 1e3:8.3f} ms")
    log(f"postproc (decode+nms+recall):    "
        f"{(results['eval_step'] - results['model_forward']) * 1e3:8.3f} ms")
    print({k: round(v * 1e3, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()

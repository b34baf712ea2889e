"""Whole-model validation + timing of the Pallas block kernels on TPU.

Runs the flagship model with use_pallas_fusion off vs on using the SAME
params: max-abs output diffs (must be bf16-rounding level) and chained
device timing for both paths.

    python scripts/pallas_model_check.py
"""

import dataclasses
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
    from bench import make_bench_batch
    from drn_tpu.config import get_config
    from drn_tpu.evaluate import make_eval_step
    from drn_tpu.train import build_model, init_state, make_optimizer

    base = get_config("charades_c3d_batched_eval")
    variants = {
        "xla": {},
        "stem": {"use_pallas_stem": True},
        "fusion": {"use_pallas_fusion": True},
        "stem+fusion": {"use_pallas_stem": True, "use_pallas_fusion": True},
    }
    batch = make_bench_batch(base)
    state = init_state(base, build_model(base), make_optimizer(base, 1),
                       jax.random.key(0))
    params = state.params

    ref_out = None
    bsz = batch["features"].shape[0]
    for name, flags in variants.items():
        cfg = base.replace(model=dataclasses.replace(base.model, **flags))
        model = build_model(cfg)
        out = jax.jit(model.apply)(params, batch["features"],
                                   batch["word_ids"], batch["query_mask"])
        if ref_out is None:
            ref_out = out
        else:
            diffs = {
                k: float(jnp.max(jnp.abs(
                    out[k].astype(jnp.float32)
                    - ref_out[k].astype(jnp.float32)
                )))
                for k in sorted(out)
            }
            log(f"{name}: " + "  ".join(
                f"Δ{k}={v:.4f}" for k, v in diffs.items()))

        step = make_eval_step(cfg, model)

        @partial(jax.jit, static_argnames="k")
        def run(p, b, k, step=step):
            def body(i, s):
                b2 = dict(b)
                b2["features"] = b["features"] + s * 0.0
                out = step(p, b2)
                leaves = jax.tree_util.tree_leaves(out)
                return jax.lax.optimization_barrier(
                    sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
                    * 1e-6
                )

            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        t = chained_time(lambda k: float(run(params, batch, k)))
        log(f"{name:12s} eval step: {t * 1e3:7.3f} ms  ({bsz / t:,.0f} q/s)")


if __name__ == "__main__":
    main()

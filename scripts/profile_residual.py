"""Fine-grained device timing of the post-backbone modules at flagship
shapes: fusion, FPN, grounding heads, IoU head (and the IoU head split
into sampling vs mixing). Complements profile_components.py, which stops
at query-encoder/backbone granularity.

    python scripts/profile_residual.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/drn_tpu_jit_cache")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained_time(run_k, iters=16, warmup=2, reps=5):
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
    import argparse

    from drn_tpu.config import get_config
    from drn_tpu.models.drn import location_metadata
    from drn_tpu.models.fpn import TemporalFPN
    from drn_tpu.models.fusion import CrossModalFusion
    from drn_tpu.models.heads import GroundingHeads, IoUHead
    from drn_tpu.train import build_model, init_state, make_optimizer

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="charades_c3d_batched_eval")
    args = p.parse_args()
    cfg = get_config(args.config)
    m = cfg.model
    b, base = cfg.eval.batch_size, cfg.data.num_clips
    rng = np.random.default_rng(0)
    sizes = [base // 2 ** l for l in range(m.num_levels)]
    levels = [jnp.asarray(rng.normal(size=(b, t, m.hidden_dim)), jnp.bfloat16)
              for t in sizes]
    queries = [jnp.asarray(rng.normal(size=(b, m.hidden_dim)), jnp.bfloat16)
               for _ in sizes]
    n = sum(sizes)
    locs, strides, level_ids = location_metadata(m, base)
    segments = jnp.asarray(
        np.sort(rng.uniform(0, base, size=(b, n, 2)), axis=-1), jnp.float32)

    model = build_model(cfg)
    params = init_state(cfg, model, make_optimizer(cfg, 1),
                        jax.random.key(0)).params["params"]

    def chain(fn, *args):
        @partial(jax.jit, static_argnames="kk")
        def run(args, kk):
            def body(i, s):
                perturbed = [
                    (a + s.astype(a.dtype) * 0
                     if a.dtype in (jnp.bfloat16, jnp.float32) else a)
                    for a in args
                ]
                out = fn(*perturbed)
                leaves = jax.tree_util.tree_leaves(out)
                return jax.lax.optimization_barrier(
                    sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
                    * 1e-6)

            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))

        return lambda kk: float(run(args, kk))

    def measure(name, fn, *args):
        t = chained_time(chain(fn, *args))
        log(f"{name:24s} {t * 1e3:8.3f} ms")
        return t

    # fusion (all 3 levels)
    def fusion_all(*lv):
        return [CrossModalFusion(m).apply(
            {"params": params[f"fusion_{l}"]}, lv[l], queries[l])
            for l in range(m.num_levels)]

    measure("fusion x3", fusion_all, *levels)

    # FPN
    measure("fpn", lambda *lv: TemporalFPN(m).apply(
        {"params": params["fpn"]}, list(lv)), *levels)

    # grounding heads
    measure("grounding_heads", lambda *lv: GroundingHeads(m).apply(
        {"params": params["heads"]}, list(lv)), *levels)

    # IoU head full
    measure("iou_head", lambda *lv: IoUHead(m).apply(
        {"params": params["iou_head"]}, list(lv), segments, level_ids,
        strides), *levels)

    # IoU head sampling only — the PRODUCTION path (shape-adaptive
    # flat/blocked dispatch), so this row reflects what the model runs.
    from drn_tpu.models.heads import (_BLOCKED_SAMPLING_MIN_LOCATIONS,
                                      blocked_segment_samples,
                                      flat_segment_samples)

    def sampling_only(*lv):
        starts_np = np.cumsum([0] + sizes[:-1]).astype(np.float32)
        lo = jnp.asarray(starts_np)[level_ids]
        hi = lo + jnp.asarray(np.asarray(sizes, np.float32))[level_ids] - 1.0
        start, end = segments[..., 0], segments[..., 1]
        mid = 0.5 * (start + end)
        to_idx = lambda p: jnp.clip(p / strides - 0.5 + lo, lo, hi)
        pos = jnp.concatenate(
            [to_idx(start), to_idx(mid), to_idx(end)], axis=1)
        sample = (blocked_segment_samples
                  if n >= _BLOCKED_SAMPLING_MIN_LOCATIONS
                  else flat_segment_samples)
        return sample(list(lv), pos, sizes)

    measure("iou sampling only", sampling_only, *levels)


if __name__ == "__main__":
    main()

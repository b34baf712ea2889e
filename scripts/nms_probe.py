"""Isolated NMS timing: K-step fori_loop sweep vs while-loop fixpoint,
B=48, K=48 (flagship shapes), plus adversarial worst-case chains.

    python scripts/nms_probe.py
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

from drn_tpu.ops.temporal import temporal_iou


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained_time(run_k, iters=96, warmup=2, reps=5):
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


def nms_fori(segments, scores, thr):
    k = scores.shape[0]
    order = jnp.argsort(-scores)
    segs = segments[order]
    iou = temporal_iou(segs[:, None, :], segs[None, :, :])

    def body(i, keep):
        alive_i = keep[i]
        lower = jnp.arange(k) > i
        return keep & ~(lower & (iou[i] > thr) & alive_i)

    keep = jax.lax.fori_loop(0, k, body, jnp.ones((k,), bool))
    return order, keep, segs


def nms_fix(segments, scores, thr):
    from drn_tpu.ops.nms import temporal_nms

    return temporal_nms(segments, scores, thr)


def main():
    b, k = 48, 48
    rng = np.random.default_rng(0)
    start = rng.uniform(0, 50, (b, k)).astype(np.float32)
    length = rng.uniform(1, 30, (b, k)).astype(np.float32)
    segs = jnp.asarray(np.stack([start, start + length], -1))
    scores = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)

    # adversarial: every row one long suppression chain (max fixpoint depth)
    st = np.tile(np.arange(k, dtype=np.float32) * 4.0, (b, 1))
    segs_chain = jnp.asarray(np.stack([st, st + 10.0], -1))
    scores_chain = jnp.asarray(
        np.tile(np.arange(k, 0, -1, dtype=np.float32), (b, 1)))

    for name, fn in [("fori(K steps)", nms_fori), ("fixpoint", nms_fix)]:
        vm = jax.vmap(lambda s, sc, fn=fn: fn(s, sc, 0.5))

        @partial(jax.jit, static_argnames="kk")
        def run(segs, scores, kk, vm=vm):
            def body(i, s):
                o, keep, ss = vm(segs + s * 0.0, scores)
                return jax.lax.optimization_barrier(
                    jnp.float32(jnp.sum(keep)) + 1e-6 * jnp.sum(ss))

            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))

        for label, (sg, sc) in [("random", (segs, scores)),
                                ("chain", (segs_chain, scores_chain))]:
            t = chained_time(lambda kk, sg=sg, sc=sc: float(run(sg, sc, kk)))
            log(f"{name:14s} {label:7s}: {t * 1e6:8.1f} us")


if __name__ == "__main__":
    main()

"""Micro-probe: IoU-head temporal sampling — gather vs one-hot matmul.

linear_time_sample does 2 take_along_axis gathers per sample point (6 per
step) over (B=384, N=112, D=512) bf16 — vector-unit work on TPU. The same
interpolation is a (B, 3N, T) @ (B, T, D) batched matmul with two nonzeros
per row — MXU work with trivial FLOPs. This measures both at flagship
shapes inside a jit chain.

    python scripts/sample_probe.py
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


def chained_time(run_k, iters=24, warmup=2, reps=5):
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


def gather_sample(feat, pos):
    t = feat.shape[1]
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (pos - lo.astype(pos.dtype))[..., None]
    f_lo = jnp.take_along_axis(feat, lo[..., None], axis=1)
    f_hi = jnp.take_along_axis(feat, hi[..., None], axis=1)
    return f_lo * (1.0 - w) + f_hi * w


def onehot_sample(feat, pos, dtype):
    t = feat.shape[1]
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos)
    w = pos - lo
    grid = jnp.arange(t, dtype=pos.dtype)
    # (B, N, T) two-nonzero interpolation matrix
    m = (jnp.where(grid == lo[..., None], 1.0 - w[..., None], 0.0)
         + jnp.where(grid == jnp.minimum(lo[..., None] + 1, t - 1),
                     w[..., None], 0.0))
    return jnp.einsum("bnt,btd->bnd", m.astype(dtype), feat.astype(dtype),
                      preferred_element_type=jnp.float32)


def main():
    b, n, t, d = 384, 112, 112, 512
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
    pos3 = jnp.asarray(rng.uniform(0, t - 1, size=(b, 3 * n)), jnp.float32)

    def chain(fn):
        @partial(jax.jit, static_argnames="kk")
        def run(feat, kk):
            def body(i, s):
                out = fn(feat + s.astype(feat.dtype) * 0)
                return jax.lax.optimization_barrier(
                    jnp.sum(out.astype(jnp.float32)) * 1e-6)

            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))

        return lambda kk: float(run(feat, kk))

    ref = jax.jit(lambda f: gather_sample(f, pos3))(feat)
    for name, fn in [
        ("gather (current)", lambda f: gather_sample(f, pos3)),
        ("onehot bf16", lambda f: onehot_sample(f, pos3, jnp.bfloat16)),
        ("onehot fp32", lambda f: onehot_sample(f, pos3, jnp.float32)),
    ]:
        out = jax.jit(fn)(feat)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        tt = chained_time(chain(fn))
        log(f"{name:18s}: {tt * 1e3:7.3f} ms  maxerr={err:.5f}")


if __name__ == "__main__":
    main()

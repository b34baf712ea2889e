"""Isolated stem-kernel sweep: fused_stem (bb x chunk grid) vs XLA at the
flagship shape (B=384, T=64, Cin=4096, Cout=512).

Whole-model check showed the stem kernel LOSING 1.7 ms at bb=4 — the
(3,4096,512) bf16 weight (12.6 MB) streams once per batch block, i.e.
(384/4) x 12.6 MB = 1.2 GB/step of HBM traffic. Bigger bb divides that
traffic; this probe finds where (if anywhere) the kernel beats XLA.

    python scripts/stem_probe.py
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
    from drn_tpu.ops.pallas.stem import _forward, xla_reference

    bsz, t, cin, cout, k = 384, 64, 4096, 512, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bsz, t, cin)), jnp.float32)
    is_, ib = jnp.ones((cin,), jnp.float32), jnp.zeros((cin,), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)) * 0.02, jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)
    os_, ob = jnp.ones((cout,), jnp.float32), jnp.zeros((cout,), jnp.float32)

    def chain(fn):
        @partial(jax.jit, static_argnames="kk")
        def run(x, kk):
            def body(i, s):
                out = fn(x + s * 0.0)
                return jax.lax.optimization_barrier(
                    jnp.sum(out.astype(jnp.float32)) * 1e-6
                )

            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))

        return lambda kk: float(run(x, kk))

    ref_fn = jax.jit(lambda x: xla_reference(
        x, is_, ib, w, b, os_, ob, cdtype=jnp.bfloat16))
    ref = ref_fn(x)
    t_ref = chained_time(chain(lambda x: xla_reference(
        x, is_, ib, w, b, os_, ob, cdtype=jnp.bfloat16)))
    log(f"xla            : {t_ref * 1e3:7.3f} ms")

    for bb in (4, 8, 16, 32):
        for chunk in (512, 1024, 2048):
            try:
                fn = lambda x, bb=bb, ch=chunk: _forward(
                    x, is_, ib, w.astype(jnp.bfloat16),
                    b.astype(jnp.bfloat16), os_, ob,
                    cdtype=jnp.bfloat16, interpret=False,
                    chunk=ch, bb=bb)
                out = jax.jit(fn)(x)
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                tt = chained_time(chain(fn))
                log(f"bb={bb:2d} chunk={chunk:4d}: {tt * 1e3:7.3f} ms  "
                    f"maxerr={err:.4f}")
            except Exception as e:
                log(f"bb={bb:2d} chunk={chunk:4d}: FAILED "
                    f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

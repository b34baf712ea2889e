"""Embedding-gradient probe: take (scatter-add bwd) vs one-hot matmul
table gradient, at flagship train shapes (B=384, L=20, V=8000, D=300).

    python scripts/embed_probe.py
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


def chained_time(run_k, iters=48, warmup=2, reps=5):
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


def take_embed(table, ids):
    return jnp.take(table, ids, axis=0)


@partial(jax.custom_vjp, nondiff_argnums=())
def matgrad_embed(table, ids):
    return jnp.take(table, ids, axis=0)


def _fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape[0])


def _bwd(res, g):
    ids, v = res
    flat_ids = ids.reshape(-1)
    gf = g.reshape(-1, g.shape[-1])
    onehot = (flat_ids[:, None] == jnp.arange(v)[None, :]).astype(g.dtype)
    dtable = jnp.einsum("bv,bd->vd", onehot, gf)
    return dtable, None


matgrad_embed.defvjp(_fwd, _bwd)


def main():
    b, l, v, d = 384, 20, 8000, 300
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(2, v, (b, l)), jnp.int32)

    for name, fn in [("take(scatter bwd)", take_embed),
                     ("matmul-grad", matgrad_embed)]:
        def loss(t, fn=fn):
            x = fn(t, ids)
            return jnp.sum(jnp.tanh(x))

        @partial(jax.jit, static_argnames="kk")
        def run(table, kk, loss=loss):
            def body(i, s):
                val, grad = jax.value_and_grad(loss)(table + s * 0.0)
                return jax.lax.optimization_barrier(
                    val + 1e-9 * jnp.sum(grad))

            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))

        # numerics check vs each other
        t = chained_time(lambda kk: float(run(table, kk)))
        log(f"{name:18s}: {t * 1e6:8.1f} us/fwd+bwd")

    g1 = jax.grad(lambda t: jnp.sum(jnp.tanh(take_embed(t, ids))))(table)
    g2 = jax.grad(lambda t: jnp.sum(jnp.tanh(matgrad_embed(t, ids))))(table)
    log(f"max grad diff: {float(jnp.max(jnp.abs(g1 - g2))):.2e}")


if __name__ == "__main__":
    main()

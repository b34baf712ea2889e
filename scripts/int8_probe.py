"""Does int8 on the MXU actually beat bf16 at our stem shapes? (v5e paper
peaks: 394 TOPS int8 vs 197 TF/s bf16.)

Times a stem-shaped matmul — the backbone's unfolded k=3 conv over C3D
features, (B*T, 3*4096) x (3*4096, 512) — as bf16 vs int8 (dynamic
per-row activation scales + per-column weight scales, int32 accumulate),
with the chained-K method. Decides whether an int8 serving path is worth
building at all.

    python scripts/tpu_run.py -- python scripts/int8_probe.py
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench as B
import numpy as np


def main():
    from drn_tpu.utils import jit_cache_dir

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", jit_cache_dir())
    import jax
    import jax.numpy as jnp

    m, k, n = 48 * 64, 3 * 4096, 512
    iters = 64
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    B.phase(f"backend={jax.default_backend()} shape=({m},{k})x({k},{n})")

    flops = 2.0 * m * k * n

    def time_variant(name, body):
        @partial(jax.jit, static_argnames="t")
        def chained(a, w, t):
            def f(i, s):
                out = body(a + s * 0.0, w)
                return jax.lax.optimization_barrier(
                    jnp.float32(jnp.sum(out) * 1e-9))

            return jax.lax.fori_loop(0, t, f, jnp.float32(0))

        compiled = dict(zip((1, 1 + iters), B._aot_compile(
            chained, [((a, w), {"t": t}) for t in (1, 1 + iters)],
            [f"{name} t={t}" for t in (1, 1 + iters)])))
        per, t1 = B._chained_time(
            lambda t: float(compiled[t](a, w)), iters)
        B.phase(f"{name}: {per * 1e6:.1f} us/matmul  "
                f"{flops / per / 1e12:.1f} TF/s-equiv")
        return per

    def bf16_body(a, w):
        return jnp.dot(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    # int8: dynamic symmetric per-row scale for activations, per-column
    # for weights; int32 accumulate on the MXU; rescale in fp32.
    def int8_body(a, w):
        sa = jnp.max(jnp.abs(a), axis=1, keepdims=True) / 127.0
        qa = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
        sw = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
        qw = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qa, qw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * sa * sw

    # int8 with PRE-quantized weights (the serving case: weights are
    # quantized once offline; only the activation quant is on the clock).
    sw = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    qw_const = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)

    def int8_preq_body(a, _w):
        sa = jnp.max(jnp.abs(a), axis=1, keepdims=True) / 127.0
        qa = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qa, qw_const, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * sa * sw

    t_bf16 = time_variant("bf16", bf16_body)
    t_int8 = time_variant("int8(dynamic)", int8_body)
    t_int8p = time_variant("int8(preq-weights)", int8_preq_body)
    B.phase(f"speedup int8/bf16: {t_bf16 / t_int8:.2f}x dynamic, "
            f"{t_bf16 / t_int8p:.2f}x pre-quantized")


if __name__ == "__main__":
    main()

"""Measure: XLA fused mul+conv+bias+LN+ReLU vs Pallas kernel with the
LayerNorm+ReLU epilogue folded in (VERDICT r1 #9).

Round-1 finding: the conv-only Pallas kernel LOSES to XLA because the
custom call is a fusion barrier — the LN+ReLU then needs an extra HBM
round-trip of the (B,T,D) fp32 intermediate. Folding the epilogue into
the kernel removes that barrier; this probe measures whether the folded
kernel reaches/beats XLA's whole-block fusion at flagship shapes.

    python scripts/pallas_block_probe.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def block_kernel(v_ref, q_ref, w_ref, b_ref, s_ref, o_ref, out_ref, *, eps):
    bb, t, d = v_ref.shape
    k = w_ref.shape[0]
    x = v_ref[:] * q_ref[:]
    xp = jnp.pad(x, ((0, 0), (k // 2, k // 2), (0, 0)))
    acc = jnp.zeros((bb * t, d), jnp.float32)
    for i in range(k):
        acc += jnp.dot(
            xp[:, i : i + t, :].reshape(bb * t, d),
            w_ref[i],
            preferred_element_type=jnp.float32,
        )
    acc += b_ref[:].astype(jnp.float32)
    # LayerNorm (fp32, flax semantics) + ReLU epilogue, in VMEM
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(acc), axis=-1, keepdims=True) - jnp.square(mean)
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[:].astype(jnp.float32) + o_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.maximum(y, 0.0).reshape(bb, t, d).astype(out_ref.dtype)


def pallas_block(v, q, w, b, scale, offset, eps=1e-6, bb=16):
    bsz, t, d = v.shape
    k = w.shape[0]
    return pl.pallas_call(
        partial(block_kernel, eps=eps),
        grid=(bsz // bb,),
        in_specs=[
            pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t, d), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t * d * d * k,
            bytes_accessed=v.size * v.dtype.itemsize * 2
            + w.size * w.dtype.itemsize,
            transcendentals=0,
        ),
    )(v, q[:, None, :], w, b[None, :], scale[None, :], offset[None, :])


def xla_block(v, q, w, b, scale, offset, eps=1e-6):
    x = v * q[:, None, :]
    out = jax.lax.conv_general_dilated(
        x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
    ) + b
    out = out.astype(jnp.float32)
    mean = out.mean(-1, keepdims=True)
    var = jnp.square(out).mean(-1, keepdims=True) - jnp.square(mean)
    y = (out - mean) * jax.lax.rsqrt(var + eps) * scale + offset
    return jnp.maximum(y, 0.0).astype(v.dtype)


def chained(fn, args, iters=16, warmup=2, reps=5):
    @partial(jax.jit, static_argnames="k")
    def run(args, k):
        v = args[0]

        def body(i, s):
            out = fn(args[0] + (s * 0.0).astype(v.dtype), *args[1:])
            return jax.lax.optimization_barrier(
                jnp.sum(out).astype(jnp.float32) * 1e-6
            )

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(k):
        for _ in range(warmup):
            float(run(args, k))
        s = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(args, k))
            s.append(time.perf_counter() - t0)
        s.sort()
        return s[len(s) // 2]

    t1, t2 = timed(1), timed(1 + iters)
    return max((t2 - t1) / iters, 1e-9)


def main():
    B, T, D, K = 256, 64, 512, 3
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, D)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, D, D)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(D,)) * 0.2 + 1.0, jnp.float32)
    offset = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)

    # numerics first (bb=32 OOMs scoped VMEM: ~18M > 16M at these shapes)
    ref = jax.jit(xla_block)(v, q, w, b, scale, offset)
    ok = []
    for bb in (8, 16):
        try:
            out = jax.jit(partial(pallas_block, bb=bb))(
                v, q, w, b, scale, offset)
            diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                         - ref.astype(jnp.float32))))
            print(f"bb={bb:3d} max|Δ| vs XLA = {diff:.4f}", file=sys.stderr,
                  flush=True)
            ok.append(bb)
        except Exception as e:
            print(f"bb={bb:3d} failed: {type(e).__name__}", file=sys.stderr,
                  flush=True)

    t_xla = chained(xla_block, (v, q, w, b, scale, offset))
    print(f"xla  block: {t_xla * 1e6:9.1f} us", file=sys.stderr, flush=True)
    for bb in ok:
        t_pl = chained(partial(pallas_block, bb=bb),
                       (v, q, w, b, scale, offset))
        print(f"pallas bb={bb:3d}: {t_pl * 1e6:9.1f} us "
              f"({t_xla / t_pl:.2f}x vs xla)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()

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


def stacked_sel_sample(feat, pos):
    """Current production form (models.layers.linear_time_sample): TWO
    one-hot selections stacked → one einsum → fp32 lerp."""
    t = feat.shape[1]
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos)
    hi = jnp.minimum(lo + 1.0, t - 1.0)
    w = (pos - lo)[..., None].astype(jnp.float32)
    grid = jnp.arange(t, dtype=pos.dtype)
    sel = jnp.stack(
        [grid == lo[..., None], grid == hi[..., None]], axis=0
    ).astype(feat.dtype)
    f = jnp.einsum("sbnt,btd->sbnd", sel, feat)
    return f[0] * (1.0 - w) + f[1] * w


def shared_sel_sample(feat, pos):
    """ONE one-hot selection applied to [feat, shift₋₁(feat)]: the hi-row of
    the interpolation is feat[min(lo+1, T−1)], which is exactly row lo of
    feat shifted up one with the last row repeated — so the (B, N, T)
    selection tensor is built and read ONCE instead of twice. Bit-identical
    outputs (same selections, same fp32 lerp)."""
    t = feat.shape[1]
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos)
    w = (pos - lo)[..., None].astype(jnp.float32)
    grid = jnp.arange(t, dtype=pos.dtype)
    sel = (grid == lo[..., None]).astype(feat.dtype)        # (B, N, T)
    shifted = jnp.concatenate([feat[:, 1:], feat[:, -1:]], axis=1)
    f = jnp.einsum("bnt,sbtd->sbnd", sel, jnp.stack([feat, shifted]))
    return f[0] * (1.0 - w) + f[1] * w


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None,
                   help="probe at a registry config's eval shapes "
                        "(per-level blocked sampling) instead of the "
                        "flagship flat shapes")
    args = p.parse_args()

    rng = np.random.default_rng(0)

    def chain(fn, feat):
        @partial(jax.jit, static_argnames="kk")
        def run(feat, kk):
            def body(i, s):
                if isinstance(feat, (list, tuple)):
                    fs = [f + s.astype(f.dtype) * 0 for f in feat]
                    out = fn(fs)
                else:
                    out = fn(feat + s.astype(feat.dtype) * 0)
                return jax.lax.optimization_barrier(
                    jnp.sum(out.astype(jnp.float32)) * 1e-6)

            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))

        return lambda kk: float(run(feat, kk))

    if args.config:
        from drn_tpu.config import get_config

        cfg = get_config(args.config)
        m = cfg.model
        b, base, d = cfg.eval.batch_size, cfg.data.num_clips, m.hidden_dim
        sizes = [base // 2 ** l for l in range(m.num_levels)]
        levels = [jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
                  for t in sizes]
        # per-level flat positions, 3 samples per location, as the IoU
        # head's blocked path produces them
        pos_l = [jnp.asarray(rng.uniform(0, t - 1, size=(b, 3 * t)),
                             jnp.float32) for t in sizes]
        log(f"{args.config}: B={b} sizes={sizes} D={d}")

        def per_level(one_level_fn):
            def run(levels):
                outs = [one_level_fn(f, p) for f, p in zip(levels, pos_l)]
                return jnp.concatenate([o.astype(jnp.float32).sum(1)
                                        for o in outs], axis=-1)

            return run

        variants = [
            ("stacked-sel (prod)", per_level(stacked_sel_sample)),
            ("shared-sel+shift", per_level(shared_sel_sample)),
            ("gather", per_level(gather_sample)),
            ("combined-W bf16", per_level(
                lambda f, p: onehot_sample(f, p, jnp.bfloat16))),
        ]
        ref = jax.jit(variants[0][1])(levels)
        for name, fn in variants:
            out = jax.jit(fn)(levels)
            err = float(jnp.max(jnp.abs(out - ref)))
            tt = chained_time(chain(fn, levels))
            log(f"{name:20s}: {tt * 1e3:7.3f} ms  maxdiff(sum)={err:.5f}")
        return

    b, n, t, d = 384, 112, 112, 512
    feat = jnp.asarray(rng.normal(size=(b, t, d)), jnp.bfloat16)
    pos3 = jnp.asarray(rng.uniform(0, t - 1, size=(b, 3 * n)), jnp.float32)

    ref = jax.jit(lambda f: gather_sample(f, pos3))(feat)
    for name, fn in [
        ("gather (current)", lambda f: gather_sample(f, pos3)),
        ("stacked-sel (prod)", lambda f: stacked_sel_sample(f, pos3)),
        ("shared-sel+shift", lambda f: shared_sel_sample(f, pos3)),
        ("onehot bf16", lambda f: onehot_sample(f, pos3, jnp.bfloat16)),
        ("onehot fp32", lambda f: onehot_sample(f, pos3, jnp.float32)),
    ]:
        out = jax.jit(fn)(feat)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        tt = chained_time(chain(fn, feat))
        log(f"{name:18s}: {tt * 1e3:7.3f} ms  maxerr={err:.5f}")


if __name__ == "__main__":
    main()

"""A/B probe: fold the IoU head's first mix conv through the sampling.

The round-4 residual profile (`logs/profile_tacos_r4.log` +
profile_residual.py) put the IoU head at 1.74 ms of the 5.4 ms TACoS
eval step against a 0.69 ms FLOP-ideal — the only module well below its
roofline. Hypothesis: the (B, N, 3D) sampled concat is a layout/HBM
bottleneck. Since sampling and the first k=1 mix conv are both linear,

    mix0(concat_k(Sel_k @ F))  ==  sum_k Sel_k @ (F @ W_k)

so variant B computes per-level, per-position-kind projected features
Y_k = F_l @ W_k first (three D->D matmuls per level) and samples THOSE,
summing the three samples — no 3D-wide intermediate ever exists.
Identical FLOPs, different data movement; equivalent up to bf16
accumulation order.

    python scripts/iou_mix_probe.py --config tacos_c3d

Verdict trail lives in design.md §4.2.
"""

import argparse
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


def chained_time(run_k, iters=32, warmup=2, reps=5):
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
    from drn_tpu.config import get_config
    from drn_tpu.models.drn import location_metadata
    from drn_tpu.models.heads import IoUHead
    from drn_tpu.models.layers import cdt, linear_time_sample
    from drn_tpu.train import build_model, init_state, make_optimizer

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="tacos_c3d")
    args = p.parse_args()
    cfg = get_config(args.config)
    m = cfg.model
    b, base = cfg.eval.batch_size, cfg.data.num_clips
    rng = np.random.default_rng(0)
    sizes = [base // 2 ** l for l in range(m.num_levels)]
    pyramid = [
        jnp.asarray(rng.normal(size=(b, t, m.hidden_dim)), jnp.bfloat16)
        for t in sizes
    ]
    n = sum(sizes)
    locs, strides, level_ids = location_metadata(m, base)
    segments = jnp.asarray(
        np.sort(rng.uniform(0, base, size=(b, n, 2)), axis=-1), jnp.float32)

    model = build_model(cfg)
    params = init_state(cfg, model, make_optimizer(cfg, 1),
                        jax.random.key(0)).params["params"]["iou_head"]

    head = IoUHead(m)

    def variant_a(*pyr):
        return head.apply({"params": params}, list(pyr), segments,
                          level_ids, strides)

    # -- variant B: mix_0 folded through the (linear) sampling ----------
    w0 = params["mix_0"]["Conv_0"]["kernel"][0]        # (3D, D)
    b0 = params["mix_0"]["Conv_0"]["bias"]             # (D,)
    d = m.hidden_dim
    w_kind = [w0[k * d:(k + 1) * d] for k in range(3)]  # start/mid/end

    def ln_relu(x, scope):
        ln = params[scope]["LayerNorm_0"]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + 1e-6)
        return jax.nn.relu(y * ln["scale"] + ln["bias"])

    def conv1(x, scope):
        c = params[scope]["Conv_0"]
        return x @ c["kernel"][0] + c["bias"]

    def variant_b(*pyr):
        starts_np = np.cumsum([0] + sizes[:-1]).astype(np.float32)
        lo = jnp.asarray(starts_np)[level_ids]
        hi = lo + jnp.asarray(np.asarray(sizes, np.float32))[level_ids] - 1.0
        start, end = segments[..., 0], segments[..., 1]
        mid = 0.5 * (start + end)
        to_idx = lambda q: jnp.clip(q / strides - 0.5 + lo, lo, hi)
        pos = jnp.concatenate([to_idx(start), to_idx(mid), to_idx(end)],
                              axis=1)
        starts = np.cumsum([0] + list(sizes[:-1]))
        parts = []
        for lvl, (p_l, t_l) in enumerate(zip(pyr, sizes)):
            off = int(starts[lvl])
            acc = None
            x_l = p_l.astype(cdt(m))
            for k in range(3):
                y = x_l @ w_kind[k].astype(cdt(m))      # (B, T_l, D)
                pos_l = pos[:, k * n + off: k * n + off + t_l] - float(off)
                s = linear_time_sample(y, pos_l)         # (B, T_l, D)
                acc = s if acc is None else acc + s
            parts.append(acc)
        x = jnp.concatenate(parts, axis=1) + b0          # (B, N, D)
        x = ln_relu(x, "mix_0")
        for i in range(1, m.iou_head_layers):
            x = ln_relu(conv1(x, f"mix_{i}"), f"mix_{i}")
        out = x.astype(cdt(m)) @ params["out"]["kernel"][0] \
            + params["out"]["bias"]
        return out.astype(jnp.float32)[..., 0]

    # numerics: equivalent up to bf16 accumulation order
    ya = np.asarray(variant_a(*pyramid), np.float32)
    yb = np.asarray(variant_b(*pyramid), np.float32)
    scale = max(1e-6, float(np.abs(ya).max()))
    log(f"rel diff a-vs-b: {np.abs(ya - yb).max() / scale:.3e} "
        f"(bf16 order tolerance ~1e-2)")

    def chain(fn, *args):
        @partial(jax.jit, static_argnames="kk")
        def run(arrs, kk):
            def body(i, s):
                perturbed = [a + s.astype(a.dtype) * 0 for a in arrs]
                out = fn(*perturbed)
                return jax.lax.optimization_barrier(
                    jnp.sum(out).astype(jnp.float32) * 1e-6)

            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))

        return lambda kk: float(run(args, kk))

    for name, fn in [("A: current IoUHead", variant_a),
                     ("B: folded mix_0", variant_b)]:
        t = chained_time(chain(fn, *pyramid))
        log(f"{name:24s} {t * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()

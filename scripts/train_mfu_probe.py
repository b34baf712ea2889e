"""Train-step MFU probes: where the backward actually goes (design.md §4).

Round-2 left the train-MFU question open (fwd 7.8 ms but fwd+bwd ~28.8 ms
at B=384 — bwd/fwd ≈ 2.7x where ~2x is nominal). These probes decompose
the 31 ms step with the same chained-K device-timing method as bench.py:

    python scripts/train_mfu_probe.py --probes fwd,grad,full,adam
    python scripts/train_mfu_probe.py --probes grad_noenc,grad_remat,fp32

Each probe prints one stderr line; results are recorded in
docs/design.md §4 with the FINAL verdict.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench as B  # chained-K timing helpers; bench.py owns the method
import numpy as np


def build(cfg):
    import jax

    from drn_tpu.models.drn import location_metadata
    from drn_tpu.models.losses import drn_loss
    from drn_tpu.train import build_model

    batch = B.make_bench_batch(cfg, batch_size=cfg.data.batch_size)
    model = build_model(cfg)
    params = B._init_params(cfg, model, jax.random.key(0))
    locs, _, level_ids = location_metadata(cfg.model, cfg.data.num_clips)

    def loss_fn(p, b2):
        out = model.apply(
            p, b2["features"], b2["word_ids"], b2["query_mask"]
        )
        loss, _ = drn_loss(
            cfg.model, cfg.train, out, locs, level_ids,
            b2["gt_grid"], cfg.data.num_clips, b2["valid"],
        )
        return loss

    return batch, model, params, loss_fn


def chain_time(cfg, make_body, carry0, iters, label):
    """Time `iters` chained body applications (body: (carry, batch)->carry
    with carry a pytree whose first leaf perturbs the features)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames="k")
    def chained(carry, batch, k):
        def body(i, c):
            s = jnp.float32(
                jax.tree_util.tree_leaves(c)[0].reshape(-1)[0])
            b2 = dict(batch)
            b2["features"] = batch["features"] + s * 0.0
            return jax.lax.optimization_barrier(make_body(c, b2))

        return jax.lax.fori_loop(0, k, body, carry)

    batch = chain_time.batch
    ks = (1, 1 + iters)
    compiled = dict(zip(ks, B._aot_compile(
        chained, [((carry0, batch), {"k": k}) for k in ks],
        [f"{label} k={k}" for k in ks],
    )))

    def run(k):
        out = compiled[k](carry0, batch)
        return float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])

    per_step, t1 = B._chained_time(run, iters)
    B.phase(f"{label}: {per_step * 1e3:.3f} ms/step  (k1 {t1 * 1e3:.1f} ms)")
    return per_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="charades_c3d_batched_eval")
    p.add_argument("--iters", type=int, default=24)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--probes", default="fwd,grad,full,adam")
    args = p.parse_args()
    from drn_tpu.utils import jit_cache_dir

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", jit_cache_dir())

    import jax
    import jax.numpy as jnp

    from drn_tpu.config import get_config
    from drn_tpu.train import make_optimizer
    from flax.training.train_state import TrainState

    probes = args.probes.split(",")
    cfg = get_config(args.config)
    if args.batch_size:
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, batch_size=args.batch_size))
    if "fp32" in probes:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, dtype="float32"))
    B.phase(f"backend={jax.default_backend()} probes={probes} "
            f"dtype={cfg.model.dtype}")
    batch, model, params, loss_fn = build(cfg)
    chain_time.batch = batch
    bsz = batch["features"].shape[0]
    B.phase(f"B={bsz}")

    def consume_tree(t):
        return sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) * 1e-20
                   for l in jax.tree_util.tree_leaves(t))

    for probe in probes:
        if probe in ("fwd", "fp32_fwd"):
            chain_time(cfg, lambda c, b2: loss_fn(params, b2),
                       jnp.float32(0), args.iters, probe)
        elif probe in ("grad", "fp32"):
            def body(c, b2):
                loss, grads = jax.value_and_grad(loss_fn)(params, b2)
                return loss + consume_tree(grads)

            chain_time(cfg, body, jnp.float32(0), args.iters,
                       probe if probe != "fp32" else "fp32 grad")
        elif probe == "full":
            tx = make_optimizer(cfg, 1)
            opt0 = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype),
                jax.eval_shape(tx.init, params))
            state0 = jax.device_put(
                TrainState(step=0, apply_fn=model.apply, params=params,
                           tx=tx, opt_state=opt0),
                jax.devices()[0])

            def body(state, b2):
                loss, grads = jax.value_and_grad(loss_fn)(state.params, b2)
                return state.apply_gradients(grads=grads)

            chain_time(cfg, body, state0, args.iters, "full")
        elif probe == "adam":
            tx = make_optimizer(cfg, 1)
            opt0 = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype),
                jax.eval_shape(tx.init, params))
            state0 = jax.device_put(
                TrainState(step=0, apply_fn=model.apply, params=params,
                           tx=tx, opt_state=opt0),
                jax.devices()[0])
            fixed_grads = jax.tree_util.tree_map(
                lambda x: jnp.full_like(x, 1e-6), params)

            def body(state, b2):
                # constant grads: times ONLY clip+adam+apply, chained via
                # the carried state
                return state.apply_gradients(grads=fixed_grads)

            chain_time(cfg, body, state0, args.iters, "adam-only")
        elif probe == "grad_noenc":
            # Backward WITHOUT the query-encoder branch: grads w.r.t. all
            # params except query_encoder/embed — the LSTM scan's reverse
            # pass (and embedding grads) drop out of the graph.
            inner = params["params"]
            enc_keys = [k for k in inner
                        if "query" in k or "embed" in k.lower()]
            B.phase(f"frozen: {enc_keys}")
            frozen = {k: inner[k] for k in enc_keys}
            train = {k: v for k, v in inner.items() if k not in enc_keys}

            def loss_sub(train_p, b2):
                merged = {"params": {**train_p, **frozen}}
                return loss_fn(merged, b2)

            def body(c, b2):
                loss, grads = jax.value_and_grad(loss_sub)(train, b2)
                return loss + consume_tree(grads)

            chain_time(cfg, body, jnp.float32(0), args.iters, "grad_noenc")
        elif probe == "grad_remat":
            apply_ck = jax.checkpoint(
                lambda p, b2: loss_fn(p, b2))

            def body(c, b2):
                loss, grads = jax.value_and_grad(apply_ck)(params, b2)
                return loss + consume_tree(grads)

            chain_time(cfg, body, jnp.float32(0), args.iters, "grad_remat")
        else:
            B.phase(f"unknown probe {probe!r}")


if __name__ == "__main__":
    main()

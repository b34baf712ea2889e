"""Tests for the jaxpr FLOP counter (drn_tpu/utils/flops.py).

Oracles: hand-computed 2x-MAC counts for matmul/conv/scan, plus a
cross-check of the full DRN eval forward against XLA's own
`cost_analysis()` on the CPU backend (must agree within 10% — the counter
skips elementwise ops, XLA counts them, so counter <= XLA).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drn_tpu.utils.flops import estimate_flops


def test_matmul_flops_exact():
    a = jnp.zeros((8, 32), jnp.float32)
    b = jnp.zeros((32, 16), jnp.float32)
    assert estimate_flops(jnp.dot, a, b) == 2 * 8 * 32 * 16


def test_batched_dot_general_flops():
    a = jnp.zeros((4, 8, 32), jnp.float32)
    b = jnp.zeros((4, 32, 16), jnp.float32)
    fn = lambda x, y: jax.lax.dot_general(
        x, y, (((2,), (1,)), ((0,), (0,)))
    )
    assert estimate_flops(fn, a, b) == 2 * 4 * 8 * 32 * 16


def test_conv1d_flops_exact():
    # (B=2, T=16, Cin=8) * kernel (k=3, Cin=8, Cout=4), SAME padding.
    x = jnp.zeros((2, 16, 8), jnp.float32)
    k = jnp.zeros((3, 8, 4), jnp.float32)
    fn = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
    )
    # out elems = 2*16*4; MACs/out = 3*8.
    assert estimate_flops(fn, x, k) == 2 * (2 * 16 * 4) * (3 * 8)


def test_scan_multiplies_by_length():
    w = jnp.zeros((32, 32), jnp.float32)
    xs = jnp.zeros((10, 32), jnp.float32)

    def step(carry, x):
        return carry @ w + x, ()

    fn = lambda xs: jax.lax.scan(step, jnp.zeros((32,)), xs)[0]
    # carry (32,) @ (32,32) per step: 2*32*32 MACs-ish -> 2*1*32*32 flops.
    assert estimate_flops(fn, xs) == 10 * 2 * 32 * 32


def test_jit_wrapped_fn_counts_inner(monkeypatch):
    a = jnp.zeros((8, 32), jnp.float32)
    b = jnp.zeros((32, 16), jnp.float32)
    assert estimate_flops(jax.jit(jnp.dot), a, b) == 2 * 8 * 32 * 16


def test_drn_forward_matches_xla_cost_analysis():
    from drn_tpu.config import get_config
    from drn_tpu.train import build_model, init_state, make_optimizer

    cfg = get_config("synthetic_tiny")
    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 1), jax.random.key(0))
    b, t, f = 4, cfg.data.num_clips, cfg.model.feature_dim
    l = cfg.data.max_query_len
    feats = jnp.zeros((b, t, f), jnp.float32)
    words = jnp.zeros((b, l), jnp.int32)
    mask = jnp.ones((b, l), bool)

    fwd = lambda p: model.apply(p, feats, words, mask)
    mine = estimate_flops(fwd, state.params)
    assert mine > 0

    lowered = jax.jit(fwd).lower(state.params)
    try:
        ca = lowered.cost_analysis()
        if ca is None:
            ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        xla = float(ca.get("flops", 0.0))
    except Exception:
        pytest.skip("cost_analysis unavailable on this backend")
    if not xla:
        pytest.skip("cost_analysis reported no flops")
    # The counter skips elementwise ops and XLA folds some 1x1 convs its
    # own way; agreement within 15% catches the gross failure modes
    # (missing scan multipliers, wrong contraction dims) that matter for
    # MFU reporting.
    assert 0.85 * xla <= mine <= 1.15 * xla, (mine, xla)

"""conv_ln_relu / fused_fusion_block Pallas kernels vs XLA references
(interpret mode on CPU; the real-TPU numbers live in
scripts/pallas_block_probe.py / pallas_model_check.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drn_tpu.ops.pallas.conv_block import conv_ln_relu, xla_reference
from drn_tpu.ops.pallas.fused_fusion import (fused_fusion_block,
                                             xla_block_reference)


def _inputs(b=4, t=32, cin=128, cout=128, k=3, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t, cin)), dtype)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)) * 0.05, dtype)
    bias = jnp.asarray(rng.normal(size=(cout,)) * 0.1, dtype)
    scale = jnp.asarray(rng.normal(size=(cout,)) * 0.2 + 1.0, jnp.float32)
    offset = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    return x, w, bias, scale, offset


@pytest.mark.parametrize("k,stride", [(3, 1), (3, 2), (1, 1)])
def test_conv_block_forward_matches_xla(k, stride):
    x, w, b, s, o = _inputs(k=k)
    got = conv_ln_relu(x, w, b, s, o, stride, True, True)
    want = xla_reference(x, w, b, s, o, stride=stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv_block_norm_act_flags():
    x, w, b, s, o = _inputs()
    for use_norm, use_act in ((False, True), (True, False), (False, False)):
        got = conv_ln_relu(x, w, b, s, o, 1, use_norm, use_act)
        want = xla_reference(x, w, b, s, o, stride=1, use_norm=use_norm,
                             use_act=use_act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_conv_block_odd_time_length():
    # head towers run over the gap-padded concat (e.g. T=114 — not a
    # multiple of the 8/16-row tile): the kernel must handle ragged T
    x, w, b, s, o = _inputs(t=57)
    got = conv_ln_relu(x, w, b, s, o, 1, True, True)
    want = xla_reference(x, w, b, s, o)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv_block_vjp_matches_xla_autodiff():
    x, w, b, s, o = _inputs(b=2, t=16)

    def loss_pl(x, w, b, s, o):
        return jnp.sum(jnp.sin(conv_ln_relu(x, w, b, s, o, 2, True, True)))

    def loss_xla(x, w, b, s, o):
        return jnp.sum(jnp.sin(xla_reference(x, w, b, s, o, stride=2)))

    g1 = jax.grad(loss_pl, argnums=(0, 1, 2, 3, 4))(x, w, b, s, o)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, w, b, s, o)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)


def test_fused_block_forward_and_vjp_match_xla():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(4, 32, 128)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 128, 128)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.normal(size=(128,)) * 0.2 + 1.0, jnp.float32)
    o = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)

    got = fused_fusion_block(v, q, w, b, s, o)
    want = xla_block_reference(v, q, w, b, s, o)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    def loss_pl(*a):
        return jnp.sum(jnp.sin(fused_fusion_block(*a)))

    def loss_xla(*a):
        return jnp.sum(jnp.sin(xla_block_reference(*a)))

    g1 = jax.grad(loss_pl, argnums=tuple(range(6)))(v, q, w, b, s, o)
    g2 = jax.grad(loss_xla, argnums=tuple(range(6)))(v, q, w, b, s, o)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)


def test_fused_stem_matches_xla():
    from drn_tpu.ops.pallas.stem import fused_stem
    from drn_tpu.ops.pallas.stem import xla_reference as stem_ref

    rng = np.random.default_rng(0)
    # Cin=256 → two 128-wide chunks in interpret mode exercises the
    # chunked-accumulation grid axis
    x = jnp.asarray(rng.normal(size=(4, 16, 256)) * 3.0, jnp.float32)
    i_s = jnp.asarray(rng.normal(size=(256,)) * 0.2 + 1.0, jnp.float32)
    i_b = jnp.asarray(rng.normal(size=(256,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 256, 128)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)
    o_s = jnp.asarray(rng.normal(size=(128,)) * 0.2 + 1.0, jnp.float32)
    o_b = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)

    got = fused_stem(x, i_s, i_b, w, b, o_s, o_b, jnp.float32)
    want = stem_ref(x, i_s, i_b, w, b, o_s, o_b, cdtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # force TWO Cin chunks so the accumulate-across-grid axis runs
    from drn_tpu.ops.pallas.stem import _forward

    got2 = _forward(x, i_s, i_b, w, b, o_s, o_b, cdtype=jnp.float32,
                    interpret=True, chunk=128)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    def loss_pl(x, w):
        return jnp.sum(
            jnp.sin(fused_stem(x, i_s, i_b, w, b, o_s, o_b, jnp.float32))
        )

    def loss_xla(x, w):
        return jnp.sum(
            jnp.sin(stem_ref(x, i_s, i_b, w, b, o_s, o_b,
                             cdtype=jnp.float32))
        )

    g1 = jax.grad(loss_pl, argnums=(0, 1))(x, w)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)


def test_model_level_param_sharing_cpu():
    """With use_pallas_fusion=True on CPU the model must fall back to the
    XLA path (backend gate) and produce identical outputs/param trees."""
    from drn_tpu.config import get_config
    from drn_tpu.train import build_model, init_state, make_optimizer

    cfg = get_config("synthetic_tiny")
    cfg_on = cfg.replace(
        model=dataclasses.replace(cfg.model, use_pallas_fusion=True)
    )
    m_off, m_on = build_model(cfg), build_model(cfg_on)
    state = init_state(cfg, m_off, make_optimizer(cfg, 1), jax.random.key(0))

    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.normal(size=(2, cfg.data.num_clips, cfg.model.feature_dim)),
        jnp.float32,
    )
    words = jnp.asarray(rng.integers(2, cfg.model.vocab_size, (2, 8)),
                        jnp.int32)
    mask = jnp.asarray(np.arange(8)[None, :] < np.asarray([[5], [8]]))
    o1 = m_off.apply(state.params, feats, words, mask)
    o2 = m_on.apply(state.params, feats, words, mask)
    for k in o1:
        np.testing.assert_array_equal(np.asarray(o1[k]), np.asarray(o2[k]))

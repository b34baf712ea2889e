"""Pallas fused-fusion kernel vs pure-XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from drn_tpu.ops.pallas.fused_fusion import fused_fusion, xla_reference


def _inputs(b=2, t=32, d=128, k=3, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.normal(size=(b, t, d)), dtype)
    q = jnp.asarray(rng.normal(size=(b, d)), dtype)
    w = jnp.asarray(rng.normal(size=(k, d, d)) * 0.05, dtype)
    bias = jnp.asarray(rng.normal(size=(d,)), dtype)
    return v, q, w, bias


def test_forward_matches_xla():
    v, q, w, bias = _inputs()
    got = fused_fusion(v, q, w, bias)
    want = xla_reference(v, q, w, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_forward_matches_xla_bf16():
    v, q, w, bias = _inputs(dtype=jnp.bfloat16)
    got = np.asarray(fused_fusion(v, q, w, bias), np.float32)
    want = np.asarray(xla_reference(v, q, w, bias), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_custom_vjp_matches_xla_autodiff():
    v, q, w, bias = _inputs(b=2, t=16, d=128)

    def loss_pallas(v, q, w, b):
        return jnp.sum(jnp.sin(fused_fusion(v, q, w, b)))

    def loss_xla(v, q, w, b):
        return jnp.sum(jnp.sin(xla_reference(v, q, w, b)))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(v, q, w, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(v, q, w, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)


def test_jit_and_vmap_compose():
    v, q, w, bias = _inputs(b=4, t=32, d=128)
    f = jax.jit(fused_fusion)
    np.testing.assert_allclose(
        np.asarray(f(v, q, w, bias)),
        np.asarray(xla_reference(v, q, w, bias)),
        rtol=1e-4, atol=1e-4,
    )

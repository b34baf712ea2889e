"""Pallas TPU kernel: conv1d + bias + LayerNorm + ReLU in one pass.

The network is a stack of ConvBlocks (conv → LN(fp32) → ReLU); under XLA
each block materializes the conv output in HBM before the LayerNorm reads
it back. This kernel computes the whole block in VMEM: K shifted
(BB·T_out, Cin) @ (Cin, Cout) MXU matmuls with fp32 accumulation, then the
LN+ReLU epilogue on the accumulator — one HBM read of x, one HBM write of
the final activations. Same design as the cross-modal
`fused_fusion_block` (ops/pallas/fused_fusion.py), which measures 1.15x
vs XLA's own whole-block fusion on v5e; this variant generalizes it to
plain blocks with kernel width {1, 3} and stride {1, 2} — every ConvBlock
in the backbone levels, head towers, and IoU head.

Backward is recompute-based through the mathematically identical XLA
reference (`jax.vjp`), like fused_fusion_block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def _same_padding(t: int, k: int, stride: int) -> tuple[int, int, int]:
    """XLA 'SAME' padding: (out_t, pad_left, pad_right)."""
    out_t = -(-t // stride)
    total = max((out_t - 1) * stride + k - t, 0)
    left = total // 2
    return out_t, left, total - left


def _kernel(x_ref, w_ref, b_ref, s_ref, o_ref, out_ref, *, stride: int,
            use_norm: bool, use_act: bool):
    bb, t, cin = x_ref.shape
    k = w_ref.shape[0]
    cout = w_ref.shape[2]
    out_t, left, right = _same_padding(t, k, stride)

    x = x_ref[:]
    acc = jnp.zeros((bb * out_t, cout), jnp.float32)
    if stride == 1:
        xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
        for i in range(k):
            acc += jnp.dot(
                xp[:, i : i + out_t, :].reshape(bb * out_t, cin),
                w_ref[i],
                preferred_element_type=jnp.float32,
            )
    else:
        assert stride == 2
        # Strided taps via a pair reshape (Mosaic-friendly: no strided
        # slicing): xp4[:, j, p] = xp[:, 2j + p].
        xp = jnp.pad(x, ((0, 0), (left, 2 * (out_t + 1) - t - left), (0, 0)))
        xp4 = xp.reshape(bb, out_t + 1, 2, cin)
        for i in range(k):
            tap = xp4[:, i // 2 : i // 2 + out_t, i % 2, :]
            acc += jnp.dot(
                tap.reshape(bb * out_t, cin),
                w_ref[i],
                preferred_element_type=jnp.float32,
            )
    acc += b_ref[:].astype(jnp.float32)
    if use_norm:
        mean = jnp.mean(acc, axis=-1, keepdims=True)
        var = (jnp.mean(jnp.square(acc), axis=-1, keepdims=True)
               - jnp.square(mean))
        acc = (acc - mean) * jax.lax.rsqrt(var + _LN_EPS)
        acc = (acc * s_ref[:].astype(jnp.float32)
               + o_ref[:].astype(jnp.float32))
    if use_act:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = acc.reshape(bb, out_t, cout).astype(out_ref.dtype)


def _batch_block(bsz: int, t: int, cin: int, cout: int, itemsize: int) -> int:
    """Input tile ≤ ~0.75 MiB: small blocks pipeline HBM loads better
    (measured: bb=8 beats bb=16 at T=64, D=512) and keep the fp32
    accumulator + LN temporaries inside the ~16 MiB scoped-VMEM budget
    even with the weights resident."""
    for bb in (8, 4, 2):
        if bsz % bb == 0 and bb * t * max(cin, cout) * itemsize <= 3 * 2**18:
            return bb
    return 1


def _forward(x, w, b, scale, offset, *, stride, use_norm, use_act,
             interpret):
    bsz, t, cin = x.shape
    k, _, cout = w.shape
    out_t, _, _ = _same_padding(t, k, stride)
    bb = _batch_block(bsz, t, cin, cout, x.dtype.itemsize)
    kern = partial(_kernel, stride=stride, use_norm=use_norm,
                   use_act=use_act)
    return pl.pallas_call(
        kern,
        grid=(bsz // bb,),
        in_specs=[
            pl.BlockSpec((bb, t, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, out_t, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, out_t, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * out_t * cin * cout * k,
            bytes_accessed=x.size * x.dtype.itemsize
            + w.size * w.dtype.itemsize
            + bsz * out_t * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, b[None, :], scale[None, :], offset[None, :])


def xla_reference(x, w, b, scale, offset, *, stride=1, use_norm=True,
                  use_act=True):
    """Pure-XLA block: validation oracle, CPU fallback, backward source.
    Matches flax ConvBlock semantics exactly (layers.py)."""
    out = jax.lax.conv_general_dilated(
        x, w, (stride,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
    ) + b
    if use_norm:
        out = out.astype(jnp.float32)
        mean = out.mean(-1, keepdims=True)
        var = jnp.square(out).mean(-1, keepdims=True) - jnp.square(mean)
        out = (out - mean) * jax.lax.rsqrt(var + _LN_EPS)
        out = out * scale.astype(jnp.float32) + offset.astype(jnp.float32)
    if use_act:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def conv_ln_relu(x, w, b, scale, offset, stride=1, use_norm=True,
                 use_act=True):
    """relu(LayerNorm(conv1d(x, w, SAME, stride) + b) · scale + offset).

    x: (B, T, Cin); w: (K, Cin, Cout) WIO, K odd; b/scale/offset: (Cout,).
    Output (B, ceil(T/stride), Cout) in x.dtype; LN in fp32.
    """
    interpret = jax.default_backend() != "tpu"
    return _forward(x, w, b, scale, offset, stride=stride,
                    use_norm=use_norm, use_act=use_act, interpret=interpret)


def _fwd(x, w, b, scale, offset, stride, use_norm, use_act):
    return conv_ln_relu(x, w, b, scale, offset, stride, use_norm,
                        use_act), (x, w, b, scale, offset)


def _bwd(stride, use_norm, use_act, res, g):
    _, vjp = jax.vjp(
        partial(xla_reference, stride=stride, use_norm=use_norm,
                use_act=use_act),
        *res,
    )
    return vjp(g)


conv_ln_relu.defvjp(_fwd, _bwd)

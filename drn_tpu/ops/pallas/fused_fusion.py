"""Pallas TPU kernel: fused cross-modal fusion (tile-query ⊙ video → conv1d).

The hottest op in DRN (SURVEY.md §4.1 "HOTTEST op", §8 step 7). The XLA path
materializes the Hadamard product (B, T, D) in HBM between the multiply and
the conv; this kernel keeps it in VMEM and expresses the width-K conv as K
shifted (T, D) @ (D, D) matmuls accumulated in fp32 on the MXU — one HBM
read of `v`, one HBM write of the output, weights resident in VMEM across
the batch grid.

Autodiff: `fused_fusion` carries a custom VJP whose backward is pure XLA
(conv-transpose + einsums) — validated against autodiff of the XLA forward
in tests/test_pallas_fusion.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fusion_kernel(v_ref, q_ref, w_ref, b_ref, o_ref):
    bb, t, d = v_ref.shape
    k = w_ref.shape[0]
    x = v_ref[:] * q_ref[:]                      # (BB, T, D) ⊙ (BB, 1, D)
    xp = jnp.pad(x, ((0, 0), (k // 2, k // 2), (0, 0)))  # stays in VMEM
    acc = jnp.zeros((bb * t, d), jnp.float32)
    for i in range(k):                           # K static → unrolled matmuls
        # One (BB·T, D) @ (D, D) per tap — M is large enough to fill the
        # MXU (vs one small per-example matmul, which measured ~1.5x slower
        # than XLA's conv at B=128, T=64, D=512).
        acc += jnp.dot(
            xp[:, i : i + t, :].reshape(bb * t, d),
            w_ref[i],
            preferred_element_type=jnp.float32,
        )
    acc += b_ref[:].astype(jnp.float32)
    o_ref[:] = acc.reshape(bb, t, d).astype(o_ref.dtype)


def _batch_block(bsz: int, t: int, d: int, itemsize: int) -> int:
    """Largest batch block whose (BB, T, D) tile stays <= 1 MiB — big enough
    to fill the MXU, small enough that double-buffered in/out tiles + the
    fp32 accumulator + resident weights fit the ~16 MiB VMEM budget."""
    for bb in (16, 8, 4, 2):
        if bsz % bb == 0 and bb * t * d * itemsize <= 2 ** 20:
            return bb
    return 1


def _forward(v, q, w, b, *, interpret: bool):
    bsz, t, d = v.shape
    k = w.shape[0]
    # Symmetric (k//2, k//2) padding here and the VJP's conv-transpose
    # match XLA 'SAME' only for odd widths.
    assert k % 2 == 1, f"fused_fusion requires odd kernel width, got {k}"
    bb = _batch_block(bsz, t, d, v.dtype.itemsize)
    return pl.pallas_call(
        _fusion_kernel,
        grid=(bsz // bb,),
        in_specs=[
            pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # q as (B, 1, D) so the block's last two dims (1, D) exactly
            # match the array dims (TPU lowering requires (8k, 128k) blocks
            # OR full-array dims; (1, D) over a (B, D) array is neither).
            pl.BlockSpec((bb, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, t, d), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t * d * d * k,
            bytes_accessed=v.size * v.dtype.itemsize * 2 + w.size * w.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(v, q[:, None, :], w, b[None, :])


@jax.custom_vjp
def fused_fusion(v, q, w, b):
    """conv1d(v * q[:, None, :], w, SAME) + b.

    v: (B, T, D) video level; q: (B, D) level query; w: (K, D, D) WIO conv
    kernel; b: (D,). Returns (B, T, D) in v.dtype.
    """
    interpret = jax.default_backend() != "tpu"
    return _forward(v, q, w, b, interpret=interpret)


# --------------------------------------------------------------------------
# Whole-block kernel: Hadamard ⊙ conv1d + bias + LayerNorm + ReLU in ONE
# pallas_call. The round-1 conv-only kernel tied XLA in isolation but LOST
# in context (+0.6 ms/step): a custom call is a fusion barrier, so the
# LN+ReLU needed an extra HBM round-trip of the (B, T, D) intermediate.
# Folding the epilogue removes the barrier; measured on v5e at B=256,
# T=64, D=512, K=3 (scripts/pallas_block_probe.py): 178 us vs 204 us for
# XLA's own whole-block fusion — 1.15x, batch block 8 (16 is 0.91x:
# smaller blocks pipeline the HBM loads better at these shapes).
# --------------------------------------------------------------------------

_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def _block_kernel(v_ref, q_ref, w_ref, b_ref, s_ref, o_ref, out_ref):
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
    # LayerNorm (fp32, flax fast-variance semantics) + ReLU, in VMEM
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(acc), axis=-1, keepdims=True) - jnp.square(mean)
    y = (acc - mean) * jax.lax.rsqrt(var + _LN_EPS)
    y = y * s_ref[:].astype(jnp.float32) + o_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.maximum(y, 0.0).reshape(bb, t, d).astype(out_ref.dtype)


def _block_batch_block(bsz: int) -> int:
    """8 measured fastest (see module comment); >=16 also risks scoped-VMEM
    OOM from the fp32 accumulator + LN temporaries at T=64, D=512."""
    for bb in (8, 4, 2):
        if bsz % bb == 0:
            return bb
    return 1


def _block_forward(v, q, w, b, scale, offset, *, interpret: bool):
    bsz, t, d = v.shape
    k = w.shape[0]
    assert k % 2 == 1, f"fused_fusion_block requires odd kernel width, got {k}"
    bb = _block_batch_block(bsz)
    return pl.pallas_call(
        _block_kernel,
        grid=(bsz // bb,),
        in_specs=[
            pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, t, d), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t * d * d * k,
            bytes_accessed=v.size * v.dtype.itemsize * 2
            + w.size * w.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(v, q[:, None, :], w, b[None, :], scale[None, :], offset[None, :])


def xla_block_reference(v, q, w, b, scale, offset):
    """Pure-XLA whole block (mul → conv → bias → LN → ReLU): validation
    oracle, CPU/GPU fallback, and the backward-pass recompute source."""
    out = xla_reference(v, q, w, b).astype(jnp.float32)
    mean = out.mean(-1, keepdims=True)
    var = jnp.square(out).mean(-1, keepdims=True) - jnp.square(mean)
    y = (out - mean) * jax.lax.rsqrt(var + _LN_EPS)
    y = y * scale.astype(jnp.float32) + offset.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(v.dtype)


@jax.custom_vjp
def fused_fusion_block(v, q, w, b, scale, offset):
    """relu(LayerNorm(conv1d(v ⊙ q, w, SAME) + b) * scale + offset).

    v: (B, T, D); q: (B, D); w: (K, D, D) WIO; b, scale, offset: (D,).
    LayerNorm runs in fp32 with flax defaults (eps 1e-6, fast variance);
    output in v.dtype.
    """
    interpret = jax.default_backend() != "tpu"
    return _block_forward(v, q, w, b, scale, offset, interpret=interpret)


def _block_fwd(v, q, w, b, scale, offset):
    return fused_fusion_block(v, q, w, b, scale, offset), (
        v, q, w, b, scale, offset,
    )


def _block_bwd(res, g):
    # Recompute-based backward through the mathematically identical XLA
    # block — one extra fused forward, no saved (B, T, D) intermediates
    # (the jax.checkpoint/remat tradeoff, chosen because the block is
    # HBM-roofline-bound and its output is cheaper to rebuild than store).
    _, vjp = jax.vjp(xla_block_reference, *res)
    return vjp(g)


fused_fusion_block.defvjp(_block_fwd, _block_bwd)


def xla_reference(v, q, w, b):
    """Pure-XLA forward used for validation and as the CPU/GPU fallback."""
    x = v * q[:, None, :]
    out = jax.lax.conv_general_dilated(
        x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
    )
    return out + b


def _fwd(v, q, w, b):
    return fused_fusion(v, q, w, b), (v, q, w)


def _bwd(res, g):
    v, q, w = res
    k, t = w.shape[0], v.shape[1]
    x = v * q[:, None, :]
    # dL/dx: correlate g with the flipped, in/out-transposed kernel.
    w_rev = jnp.flip(w, axis=0).swapaxes(1, 2)
    dx = jax.lax.conv_general_dilated(
        g, w_rev, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
    )
    dv = (dx * q[:, None, :]).astype(v.dtype)
    dq = jnp.sum(dx * v, axis=1).astype(q.dtype)
    xp = jnp.pad(x, ((0, 0), (k // 2, k // 2), (0, 0)))
    dw = jnp.stack(
        [
            jnp.einsum(
                "bti,bto->io",
                xp[:, i : i + t],
                g,
                preferred_element_type=jnp.float32,
            )
            for i in range(k)
        ]
    ).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1)).astype(g.dtype)
    return dv, dq, dw, db


fused_fusion.defvjp(_fwd, _bwd)

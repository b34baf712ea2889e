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

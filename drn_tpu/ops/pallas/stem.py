"""Pallas TPU kernel: the backbone stem as ONE pass over the features.

input LayerNorm (fp32, over Cin=4096/1024) → cast to compute dtype →
conv1d Cin→D (k=3) → bias → output LayerNorm (fp32) → ReLU.

Why a kernel here: the feature tensor is the biggest array in the step
(B=384, T=64, Cin=4096 fp32 = 402 MB). Under XLA the input LayerNorm
materializes a normalized copy in HBM (~200 MB bf16 write + read-back by
the conv), and the conv output takes another round-trip through HBM for
its own LayerNorm — ~440 MB/step of traffic this kernel eliminates by
keeping the normalized block and the fp32 accumulator in VMEM.

The conv weight (K, 4096, 512) bf16 is 12.6 MB — too big to sit in VMEM
next to the data — so the kernel runs a 2-D grid (batch-block, Cin-chunk):
the input block stays resident across the Cin-chunk steps (its index map
ignores that grid axis), the normalized copy is computed once into VMEM
scratch at chunk 0, partial matmuls accumulate into an fp32 scratch, and
the bias + output-LN + ReLU epilogue fires on the last chunk.

Backward is recompute-based through the identical XLA reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def _stem_kernel(x_ref, is_ref, ib_ref, w_ref, b_ref, os_ref, ob_ref,
                 out_ref, xn_ref, acc_ref, *, k: int, chunk: int,
                 cdtype):
    kc = pl.program_id(1)
    nkc = pl.num_programs(1)
    bb, t, cin = x_ref.shape
    cout = w_ref.shape[2]
    left = k // 2

    @pl.when(kc == 0)
    def _prologue():
        x = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = (jnp.mean(jnp.square(x), axis=-1, keepdims=True)
               - jnp.square(mean))
        xn = (x - mean) * jax.lax.rsqrt(var + _LN_EPS)
        xn = (xn * is_ref[:].astype(jnp.float32)
              + ib_ref[:].astype(jnp.float32))
        xn_ref[:, left : left + t, :] = xn.astype(cdtype)
        if left:
            xn_ref[:, :left, :] = jnp.zeros((bb, left, cin), cdtype)
            xn_ref[:, left + t :, :] = jnp.zeros((bb, left, cin), cdtype)
        acc_ref[:] = jnp.zeros((bb * t, cout), jnp.float32)

    xsl = xn_ref[:, :, pl.ds(kc * chunk, chunk)]
    acc = acc_ref[:]
    for i in range(k):
        acc += jnp.dot(
            xsl[:, i : i + t, :].reshape(bb * t, chunk),
            w_ref[i],
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc

    @pl.when(kc == nkc - 1)
    def _epilogue():
        y = acc_ref[:] + b_ref[:].astype(jnp.float32)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = (jnp.mean(jnp.square(y), axis=-1, keepdims=True)
               - jnp.square(mean))
        y = (y - mean) * jax.lax.rsqrt(var + _LN_EPS)
        y = (y * os_ref[:].astype(jnp.float32)
             + ob_ref[:].astype(jnp.float32))
        out_ref[:] = jnp.maximum(y, 0.0).reshape(bb, t, cout).astype(
            out_ref.dtype
        )


def _pick(bsz: int, candidates=(4, 2)) -> int:
    for bb in candidates:
        if bsz % bb == 0:
            return bb
    return 1


def _forward(x, in_scale, in_bias, w, b, out_scale, out_bias, *,
             cdtype, interpret: bool, chunk: int | None = None,
             bb: int | None = None):
    bsz, t, cin = x.shape
    k, _, cout = w.shape
    assert k % 2 == 1, f"fused_stem requires odd kernel width, got {k}"
    if chunk is None:
        # Largest lane-aligned divisor of Cin up to 1024, so any Cin the
        # backbone gate admits (multiple of 128) has a valid chunking —
        # e.g. Cin=1152 chunks at 128, not an assert.
        chunk = next(c for c in (1024, 512, 256, 128, cin)
                     if cin % c == 0)
    assert cin % chunk == 0
    nkc = cin // chunk
    # Batch-block size trades VMEM against weight traffic: the (K, Cin,
    # Cout) weight streams once per batch block, so HBM weight bytes =
    # (bsz/bb) x |W|. bb=16 keeps that under the feature bytes while the
    # resident input block (bb*T*Cin fp32) still fits VMEM.
    bb = bb or _pick(bsz, candidates=(16, 8, 4, 2))
    assert bsz % bb == 0, (bsz, bb)
    cdtype = jnp.dtype(cdtype)
    return pl.pallas_call(
        partial(_stem_kernel, k=k, chunk=chunk, cdtype=cdtype),
        grid=(bsz // bb, nkc),
        in_specs=[
            # input block revisited across the Cin-chunk axis (index map
            # ignores kc): loaded from HBM once per batch block
            pl.BlockSpec((bb, t, cin), lambda i, kc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i, kc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i, kc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, chunk, cout), lambda i, kc: (0, kc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, kc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, kc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, kc: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, t, cout), lambda i, kc: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t, cout), cdtype),
        scratch_shapes=[
            pltpu.VMEM((bb, t + k - 1, cin), cdtype),
            pltpu.VMEM((bb * t, cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t * cin * cout * k,
            bytes_accessed=x.size * x.dtype.itemsize
            + w.size * w.dtype.itemsize
            + bsz * t * cout * cdtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # The resident input block + xn scratch + double-buffered weight
            # chunks top Mosaic's default 16 MB scoped-vmem budget at
            # B=384 (bb=4: ~17 MB). v5e has 128 MB of VMEM; give the
            # scheduler room instead of shrinking the MXU tiles.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, in_scale[None, :], in_bias[None, :], w, b[None, :],
      out_scale[None, :], out_bias[None, :])


def xla_reference(x, in_scale, in_bias, w, b, out_scale, out_bias, *,
                  cdtype=jnp.bfloat16):
    """Pure-XLA stem (matches Backbone's input_norm → stem ConvBlock)."""
    x = x.astype(jnp.float32)
    mean = x.mean(-1, keepdims=True)
    var = jnp.square(x).mean(-1, keepdims=True) - jnp.square(mean)
    xn = (x - mean) * jax.lax.rsqrt(var + _LN_EPS)
    xn = xn * in_scale.astype(jnp.float32) + in_bias.astype(jnp.float32)
    xn = xn.astype(cdtype)
    out = jax.lax.conv_general_dilated(
        xn, w.astype(cdtype), (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b.astype(cdtype)
    out = out.astype(jnp.float32)
    mean = out.mean(-1, keepdims=True)
    var = jnp.square(out).mean(-1, keepdims=True) - jnp.square(mean)
    y = (out - mean) * jax.lax.rsqrt(var + _LN_EPS)
    y = y * out_scale.astype(jnp.float32) + out_bias.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(cdtype)


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_stem(x, in_scale, in_bias, w, b, out_scale, out_bias,
               cdtype=jnp.bfloat16):
    """relu(LN(conv1d(LN(x) · s_in + b_in, w, SAME) + b) · s_out + b_out).

    x: (B, T, Cin) float32 raw features; w: (K, Cin, Cout) WIO; both
    LayerNorms in fp32 (flax defaults). Output (B, T, Cout) in `cdtype`.
    """
    interpret = jax.default_backend() != "tpu"
    return _forward(x, in_scale, in_bias, w.astype(cdtype),
                    b.astype(cdtype), out_scale, out_bias, cdtype=cdtype,
                    interpret=interpret)


def _fwd(x, in_scale, in_bias, w, b, out_scale, out_bias, cdtype):
    return fused_stem(x, in_scale, in_bias, w, b, out_scale, out_bias,
                      cdtype), (x, in_scale, in_bias, w, b, out_scale,
                                out_bias)


def _bwd(cdtype, res, g):
    _, vjp = jax.vjp(partial(xla_reference, cdtype=cdtype), *res)
    return vjp(g)


fused_stem.defvjp(_fwd, _bwd)

"""Cross-modal fusion: tile query ⊙ video features → 1-D conv → norm → ReLU.

This is the hot op of the network (SURVEY.md §3 "Cross-modal fusion" — the
north star names it for Pallas). Parameters are owned here and shared by two
numerically equivalent execution paths:

  * XLA path: elementwise mul + `lax.conv_general_dilated` (bf16, MXU).
  * Pallas path (`drn_tpu.ops.pallas.fused_fusion`): one kernel fusing the
    Hadamard product with the conv-as-matmul, saving an HBM round-trip of
    the (B, T, D) intermediate.

Both paths read the same params, so the Pallas kernel is validated against
the XLA path in tests and can be toggled per-config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from drn_tpu.config import ModelConfig
from drn_tpu.models.layers import cdt, pdt


def _xla_fused_fusion(v, q, kernel, bias):
    """(B,T,D) ⊙ (B,D) → conv1d(k) → (B,T,D), in compute dtype."""
    x = v * q[:, None, :]
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + bias


class CrossModalFusion(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, v, q):
        """v (B, T, D) video level, q (B, D) level query → (B, T, D)."""
        cfg = self.cfg
        k = cfg.fusion_kernel_size
        d = cfg.hidden_dim
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, d, d), pdt(cfg)
        )
        bias = self.param("bias", nn.initializers.zeros, (d,), pdt(cfg))

        v = v.astype(cdt(cfg))
        q = q.astype(cdt(cfg))
        kb = kernel.astype(cdt(cfg))
        bb = bias.astype(cdt(cfg))

        use_pallas = (
            cfg.use_pallas_fusion
            and jax.default_backend() == "tpu"
            and not self.is_initializing()
        )
        if use_pallas:
            # Whole-block kernel: conv + bias + LayerNorm + ReLU in one
            # pallas_call (no fusion barrier — measured 1.15x vs XLA's own
            # block fusion on v5e; see ops/pallas/fused_fusion.py). The
            # LayerNorm submodule is not CALLED on this path, so read its
            # (already-created) params directly; init always takes the
            # XLA path below, which creates them.
            from drn_tpu.ops.pallas.fused_fusion import fused_fusion_block

            ln = self.variables["params"]["LayerNorm_0"]
            return fused_fusion_block(
                v, q, kb, bb, ln["scale"], ln["bias"]
            )

        out = _xla_fused_fusion(v, q, kb, bb)
        out = nn.LayerNorm(dtype=jnp.float32, param_dtype=pdt(cfg))(
            out.astype(jnp.float32)
        )
        return nn.relu(out).astype(cdt(cfg))

"""Video backbone: 1-D conv stack over pre-extracted clip features.

Reference equivalent: `model/backbone.py` conv1d stack (SURVEY.md §3 "Video
backbone"): project C3D-4096/I3D-1024 features to the model width, then
stride-2 temporal convs build the multi-scale levels. The wide input
projection is the single largest matmul in the network — it runs in
bfloat16 on the MXU.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

from drn_tpu.config import ModelConfig
from drn_tpu.models.layers import ConvBlock, cdt, pdt


class Backbone(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, features) -> List[jnp.ndarray]:
        """features (B, T, F) → [ (B, T/2^l, D) for l in levels ]."""
        cfg = self.cfg
        use_stem_kernel = (
            cfg.use_pallas_stem
            and jax.default_backend() == "tpu"
            and not self.is_initializing()
            and features.shape[-1] % 128 == 0  # lane-aligned Cin
            and features.shape[1] % 8 == 0
        )
        if use_stem_kernel:
            # One kernel: input-LN(Cin) → stem conv → LN(D) → ReLU — saves
            # the HBM materialization of the normalized feature copy (the
            # largest intermediate in the network). Submodules are not
            # CALLED on this path; read their params (init takes the XLA
            # path below, which creates them).
            from drn_tpu.ops.pallas.stem import fused_stem

            p = self.variables["params"]
            x = fused_stem(
                features.astype(jnp.float32),
                p["input_norm"]["scale"], p["input_norm"]["bias"],
                p["stem"]["Conv_0"]["kernel"], p["stem"]["Conv_0"]["bias"],
                p["stem"]["LayerNorm_0"]["scale"],
                p["stem"]["LayerNorm_0"]["bias"],
                cdt(cfg),
            )
        else:
            # Input features (e.g. C3D fc6 activations) have wildly varying
            # scale; normalize before the big projection.
            x = nn.LayerNorm(dtype=jnp.float32, param_dtype=pdt(cfg),
                             name="input_norm")(features.astype(jnp.float32))
            x = x.astype(cdt(cfg))
            x = ConvBlock(cfg, cfg.hidden_dim, kernel_size=3, name="stem")(x)

        levels = []
        for l in range(cfg.num_levels):
            stride = 1 if l == 0 else 2
            x = ConvBlock(cfg, cfg.hidden_dim, kernel_size=3, stride=stride,
                          name=f"level_{l}")(x)
            levels.append(x)
        return levels

"""Test env: force CPU backend with 8 virtual devices BEFORE jax imports.

Exercises the same mesh/pjit code paths as a real multi-chip TPU slice
(SURVEY.md §5) while keeping compiles fast in CI.
"""

import os

# NOTE: the sandbox pins JAX_PLATFORMS=axon (real TPU tunnel); the env var is
# not enough to override it, so also force the platform via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
assert jax.default_backend() == "cpu" and len(jax.devices()) == 8

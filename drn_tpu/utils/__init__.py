import os


def enable_jit_cache(path: str = "/tmp/drn_tpu_jit_cache") -> None:
    """Persistent XLA compilation cache — first compiles are slow (minutes
    through this sandbox's tunnel); subsequent processes reuse artifacts
    where the backend supports it."""
    import jax

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

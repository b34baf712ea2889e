import os
import zlib


def _host_tag() -> str:
    """Short fingerprint of the host CPU feature set.

    Deliberately NOT cached: this sandbox live-migrates hosts mid-process
    (observed 2026-08-18 — XLA:CPU rejected every AOT cache entry written
    before the migration), and callers like the multi-process test harness
    re-evaluate the fingerprint per retry attempt precisely so a retry
    after a migration lands in a fresh, valid cache directory. One
    /proc/cpuinfo read per call is negligible next to any compile.

    XLA:CPU AOT cache entries embed the compile machine's features; after
    a sandbox migration a stable cache path would feed mismatched
    executables (the loader warns 'could lead to ... SIGILL'). Key the
    directory by the flags line AND the model/stepping lines: XLA also
    derives LLVM tuning pseudo-features (prefer-no-gather/scatter) from
    the CPU *model*, so two hosts with identical flags can still produce
    incompatible AOT entries (observed 2026-08-17: a flags-matched cache
    entry loaded with a feature-mismatch SIGILL warning)."""
    try:
        keyed = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model", "stepping")):
                    keyed.append(line)
                if line.strip() == "":
                    break  # first CPU block is enough; all cores match
        if keyed:
            blob = "".join(sorted(keyed)).encode()
            return f"{zlib.crc32(blob) & 0xffffffff:08x}"
    except OSError:
        pass
    return "nocpuinfo"


def jit_cache_dir(path: str = "/tmp/drn_tpu_jit_cache") -> str:
    """Host-fingerprinted persistent-cache directory (no jax import)."""
    return f"{path}_{_host_tag()}"


def enable_jit_cache(path: str = "/tmp/drn_tpu_jit_cache") -> None:
    """Persistent XLA compilation cache — first compiles are slow (minutes
    through this sandbox's tunnel); subsequent processes reuse artifacts
    where the backend supports it. The directory is suffixed with a host
    CPU fingerprint (see _host_tag)."""
    import jax

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", jit_cache_dir(path))
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

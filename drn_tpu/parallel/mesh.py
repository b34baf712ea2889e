"""Device mesh + sharding layout (SURVEY.md §3.1-§3.2, §6).

The reference's only parallelism is DDP/NCCL data parallelism; the
TPU-native layout is a 2-D ("data", "model") mesh:

  * "data": batches sharded on the leading dim; gradient reduction is the
    psum XLA inserts under `jit` — the DDP-allreduce equivalent, riding ICI.
  * "model": optional tensor parallelism — output-channel dims of the wide
    conv/dense kernels are sharded; XLA inserts the matching collectives.
    With model=1 this degrades to pure DP (the parity configuration).

No hand-written collectives: shardings are declared via NamedSharding and
XLA's SPMD partitioner does the rest (scaling-book recipe).
"""

from __future__ import annotations

import collections
import itertools
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_BARRIER_SEQ: "collections.defaultdict[str, itertools.count]" = (
    collections.defaultdict(itertools.count)
)


def coordination_barrier(name: str, timeout_s: float = 600.0) -> None:
    """Host-side process rendezvous through the coordination service.

    This is NOT a device collective — it is an RPC to the jax.distributed
    coordinator, so it tolerates arbitrarily skewed arrival (up to
    `timeout_s`). Use it right after compiling a program and before its
    first execution in a multi-process run: Gloo (the CPU inter-process
    collective backend) builds a fresh context at each executable's FIRST
    collective with a hard-coded ~30 s key-exchange deadline, so a process
    that finishes compiling ahead of a sibling (cold or invalidated
    compilation cache — observed when a sandbox live-migration changed the
    host CPU mid-run and XLA:CPU rejected every AOT cache entry) dies with
    Gloo DEADLINE_EXCEEDED while the sibling is still compiling. After
    this barrier the 30 s window only has to cover execution skew.

    Barrier ids must be unique per rendezvous; a PER-NAME sequence number
    is appended, which stays consistent across processes because the
    training/eval code is SPMD (every process reaches each named barrier
    site the same number of times, in order). The counter is per name —
    not global — so call sites cannot couple: if two sites ever diverge
    in call count across processes, each site's ids still only ever meet
    their own, turning a cross-site id collision (silent wrong rendezvous)
    into a loud same-site timeout. No-op when jax.distributed is not
    initialized (single-process).
    """
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    client.wait_at_barrier(f"{name}#{next(_BARRIER_SEQ[name])}",
                           timeout_in_ms=int(timeout_s * 1000))


def aot_compile_synced(jitted, *args, name: str, timeout_s: float = 600.0):
    """AOT-compile `jitted(*args)` and rendezvous before first execution.

    The one idiom multi-process first-steps need (train loop, eval loop,
    tests): compile the executable, then meet every peer at a
    coordination-service barrier so that no process enters the program's
    first collective — where Gloo's hard ~30 s context deadline lives —
    while a peer is still compiling. Returns the compiled executable
    (static shapes: one executable serves every subsequent step)."""
    compiled = jitted.lower(*args).compile()
    coordination_barrier(name, timeout_s)
    return compiled


def make_mesh(n_devices: int | None = None, model_axis: int = 1,
              time_axis: int = 1) -> Mesh:
    """("data", "model", "time") mesh.

    data  — batch sharding (DP; the reference's DDP equivalent).
    model — tensor parallelism over wide kernel output channels.
    time  — sequence parallelism over the temporal clip axis (for long
            grids, e.g. TACoS 512 clips); XLA's SPMD partitioner inserts
            the halo exchanges the 1-D conv stencils need (SURVEY.md §6
            "long-context" row).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (model_axis * time_axis) == 0, (n, model_axis, time_axis)
    shape = (n // (model_axis * time_axis), model_axis, time_axis)
    if devices and devices[0].platform == "tpu" and n > 1:
        # Real slice: lay the mesh out along the ICI topology so the
        # inner ("model","time") axes — which carry the chattiest
        # collectives — land on physically adjacent chips
        # (SURVEY.md §3.2 ICI/DCN).
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(shape, devices=devices)
    else:
        arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "model", "time"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim of every array in the batch dict."""
    return NamedSharding(mesh, P("data"))


def feature_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, F) features: batch over "data", clip axis over "time"."""
    if mesh.shape.get("time", 1) > 1:
        return NamedSharding(mesh, P("data", "time", None))
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mesh_process_count(mesh: Mesh) -> int:
    """Number of distinct host processes contributing devices to the mesh."""
    return len({d.process_index for d in mesh.devices.flat})


def _param_spec(path_str: str, leaf: Any, model_size: int,
                min_width: int) -> P:
    """Tensor-parallel rule: shard output channels of wide kernels.

    Conv kernels are (K, Cin, Cout), Dense kernels (Cin, Cout), the embed
    table (V, E). Shard the last dim over "model" when it divides evenly
    and is wide enough (>= min_width) to be worth the collective.
    """
    if model_size <= 1 or not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return P()
    last = leaf.shape[-1]
    if "kernel" in path_str and last >= min_width and last % model_size == 0:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def param_shardings(params, mesh: Mesh, min_width: int = 128):
    """NamedSharding pytree for params: TP on wide kernels, else replicated."""
    model_size = mesh.shape["model"]

    def f(path, leaf):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        return NamedSharding(
            mesh, _param_spec(path_str, leaf, model_size, min_width)
        )

    return jax.tree_util.tree_map_with_path(f, params)

from drn_tpu.parallel.mesh import (  # noqa: F401
    aot_compile_synced,
    batch_sharding,
    coordination_barrier,
    feature_sharding,
    make_mesh,
    mesh_process_count,
    param_shardings,
    replicate,
)

from drn_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    coordination_barrier,
    feature_sharding,
    make_mesh,
    mesh_process_count,
    param_shardings,
    replicate,
)

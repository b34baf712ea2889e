from drn_tpu.models.drn import DRN  # noqa: F401

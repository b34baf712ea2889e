from drn_tpu.ops.temporal import (  # noqa: F401
    decode_segments,
    pyramid_locations,
    temporal_iou,
)
from drn_tpu.ops.nms import temporal_nms, batched_temporal_nms  # noqa: F401
from drn_tpu.ops.metrics import recall_at_n  # noqa: F401

#!/usr/bin/env bash
# Two-stage ActivityNet-Captions training (I3D by default; set CONFIG for C3D).
set -euo pipefail

FEATURES=${FEATURES:?feature dir/.h5}
ANNOTATIONS=${ANNOTATIONS:?ActivityNet-Captions JSON path template ({split})}
CONFIG=${CONFIG:-activitynet_i3d}   # or activitynet_c3d
CKPT=${CKPT:-/tmp/drn_tpu_ckpt}

common=(--config "$CONFIG" --feature-dir "$FEATURES"
        --annotation-path "$ANNOTATIONS" --checkpoint-dir "$CKPT")

python -m drn_tpu.train "${common[@]}" --stage 1
python -m drn_tpu.train "${common[@]}" --stage 2 \
    --init-from "$CKPT/$CONFIG/stage1"
python -m drn_tpu.evaluate --config "$CONFIG" \
    --feature-dir "$FEATURES" --annotation-path "$ANNOTATIONS" \
    --checkpoint-dir "$CKPT/$CONFIG/stage2"

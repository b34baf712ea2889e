#!/usr/bin/env bash
# Two-stage TACoS training (fine-grained moments, 512-clip grid).
set -euo pipefail

FEATURES=${FEATURES:?feature dir/.h5}
ANNOTATIONS=${ANNOTATIONS:?TACoS JSON path template ({split})}
CKPT=${CKPT:-/tmp/drn_tpu_ckpt}

common=(--config tacos_c3d --feature-dir "$FEATURES"
        --annotation-path "$ANNOTATIONS" --checkpoint-dir "$CKPT")

python -m drn_tpu.train "${common[@]}" --stage 1
python -m drn_tpu.train "${common[@]}" --stage 2 \
    --init-from "$CKPT/tacos_c3d/stage1"
python -m drn_tpu.evaluate --config tacos_c3d \
    --feature-dir "$FEATURES" --annotation-path "$ANNOTATIONS" \
    --checkpoint-dir "$CKPT/tacos_c3d/stage2"

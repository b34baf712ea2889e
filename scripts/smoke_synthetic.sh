#!/usr/bin/env bash
# Offline end-to-end smoke: two-stage training + eval on the synthetic
# fixture — runs anywhere (CPU or TPU), no dataset downloads.
# NOTE: each python process pays one jit compile; on a relay-attached TPU
# that's ~2-3 min per stage (~8-10 min total). Compute itself is seconds.
set -euo pipefail
CKPT=$(mktemp -d)

python -m drn_tpu.train --config synthetic_tiny --stage 1 --max-steps 10 \
    --checkpoint-dir "$CKPT"
python -m drn_tpu.train --config synthetic_tiny --stage 2 --max-steps 5 \
    --checkpoint-dir "$CKPT" --init-from "$CKPT/synthetic_tiny/stage1"
python -m drn_tpu.evaluate --config synthetic_tiny \
    --checkpoint-dir "$CKPT/synthetic_tiny/stage2"
echo "smoke ok"

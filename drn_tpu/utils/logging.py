"""Metric logging: structured JSONL to stderr, optional TensorBoard.

Reference equivalent: bare stdout prints (SURVEY.md §6 "Metrics / logging").
Here every record is machine-readable JSON, and a TensorBoard event file can
be written in parallel via tf.summary (only process 0 writes under
multi-host, mirroring the rank-0-logs DDP convention).
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, prefix: str = "train", tensorboard_dir: str = ""):
        self.prefix = prefix
        self._t0 = time.monotonic()
        self._tb = None
        if tensorboard_dir:
            import jax

            if jax.process_index() == 0:
                import tensorflow as tf  # baked in; used only for summaries

                self._tb = tf.summary.create_file_writer(
                    f"{tensorboard_dir}/{prefix}"
                )

    def log(self, step: int, metrics: Dict[str, Any]):
        rec = {"t": round(time.monotonic() - self._t0, 2),
               "tag": self.prefix, "step": step}
        floats = {}
        for k, v in metrics.items():
            try:
                floats[k] = float(v)
                rec[k] = round(floats[k], 5)
            except (TypeError, ValueError):
                rec[k] = str(v)
        print(json.dumps(rec), file=sys.stderr, flush=True)
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in floats.items():
                    tf.summary.scalar(k, v, step=step)
            self._tb.flush()

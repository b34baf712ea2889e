"""drn_tpu — a TPU-native JAX framework for temporal sentence grounding in video.

Re-implements the capabilities of the DRN reference (Alvin-Zeng/DRN, CVPR 2020
"Dense Regression Network for Video Grounding") as an idiomatic JAX/XLA/Pallas
stack: dense anchor-free 1D regression over a multi-scale temporal feature
pyramid with cross-modal query-video fusion, compiled under `jit`, with
on-device proposal decoding + temporal NMS and mesh-based data parallelism.

Reference provenance: the reference mount was empty at build time (see
SURVEY.md §0); architecture follows the CVPR 2020 paper and SURVEY.md.
"""

__version__ = "0.1.0"

from drn_tpu.config import (  # noqa: F401
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
    get_config,
    list_configs,
)

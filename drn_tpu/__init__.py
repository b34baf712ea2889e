"""drn_tpu — a TPU-native JAX framework for temporal sentence grounding
in video, with the capabilities of Alvin-Zeng/DRN (CVPR 2020).

Public API:

    from drn_tpu import get_config, list_configs
    from drn_tpu.train import train, build_model
    from drn_tpu.evaluate import evaluate, predict
    from drn_tpu.models import DRN

CLIs: `python -m drn_tpu.train`, `python -m drn_tpu.evaluate`,
`python -m drn_tpu.infer`. See README.md.
"""

from drn_tpu.config import (ExperimentConfig, get_config,  # noqa: F401
                            list_configs)

__version__ = "0.2.0"

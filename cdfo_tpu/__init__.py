"""cdfo_tpu — TPU-native compressed-video super-resolution framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of QZ1-boy/CDFO
(coding-prior-guided HEVC video SR): models, ops, data pipeline, training,
inference, metrics, and multi-chip parallelism.
"""

from .config import DataConfig, EvalConfig, ModelConfig, TrainConfig, ld_qp37, ra_qp37

__version__ = "0.1.0"

__all__ = [
    "ModelConfig", "DataConfig", "TrainConfig", "EvalConfig",
    "ld_qp37", "ra_qp37",
]

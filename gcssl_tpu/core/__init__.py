"""Core runtime: typed config tree, mesh/device setup, checkpointing, RNG."""

from gcssl_tpu.core.config import (
    CalibratorConfig,
    CalibratorDataConfig,
    CalibratorModelConfig,
    CalibratorTrainConfig,
    DetectorConfig,
    EarlyStopConfig,
    MeshConfig,
    PipelineConfig,
    PseudoLabelConfig,
    SSLClassifierConfig,
    load_config,
    config_from_dict,
    config_to_dict,
    apply_overrides,
)
from gcssl_tpu.core.mesh import (
    init_distributed,
    make_mesh,
    data_sharding,
    replicated_sharding,
)
from gcssl_tpu.core.checkpoint import CheckpointManager

__all__ = [
    "CalibratorConfig",
    "CalibratorDataConfig",
    "CalibratorModelConfig",
    "CalibratorTrainConfig",
    "DetectorConfig",
    "EarlyStopConfig",
    "MeshConfig",
    "PipelineConfig",
    "PseudoLabelConfig",
    "SSLClassifierConfig",
    "load_config",
    "config_from_dict",
    "config_to_dict",
    "apply_overrides",
    "init_distributed",
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "CheckpointManager",
]

from .core import (
    Config,
    DatasetConfig,
    LossConfig,
    ModelConfig,
    SchedulerConfig,
    TrainConfig,
    load_config,
    merge_dicts,
)

__all__ = [
    "Config", "DatasetConfig", "LossConfig", "ModelConfig",
    "SchedulerConfig", "TrainConfig", "load_config", "merge_dicts",
]

from dvt_tpu.train.schedules import CosineScheduler, cosine_schedule
from dvt_tpu.train.optim import make_adamw, sqrt_scaled_lr
from dvt_tpu.train.checkpoint import CheckpointManager
from dvt_tpu.train.logging import MetricLogger, SmoothedValue, setup_logging

__all__ = [
    "CosineScheduler",
    "cosine_schedule",
    "make_adamw",
    "sqrt_scaled_lr",
    "CheckpointManager",
    "MetricLogger",
    "SmoothedValue",
    "setup_logging",
]

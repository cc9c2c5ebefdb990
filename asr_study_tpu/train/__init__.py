"""Training subsystem: jitted steps, DP sharding, checkpoints, loops."""

from asr_study_tpu.train.trainer import (
    TrainState,
    Trainer,
    make_optimizer,
)
from asr_study_tpu.train.checkpoint import CheckpointManager

__all__ = ["TrainState", "Trainer", "make_optimizer", "CheckpointManager"]

"""Training subsystem: jitted WGAN-GP steps, growth schedule, checkpointing."""

from .checkpoint import CheckpointManager
from .grower import Grower
from .loop import train
from .saver import Saver
from .step import (TrainState, build_chunk_step, build_step,
                   init_train_state, make_optimizers)

__all__ = [
    "CheckpointManager",
    "Grower",
    "Saver",
    "TrainState",
    "build_chunk_step",
    "build_step",
    "init_train_state",
    "make_optimizers",
    "train",
]

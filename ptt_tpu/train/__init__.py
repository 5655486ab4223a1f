"""Training infrastructure: optax optimizers + schedules, the pjit data-parallel
train step over a device mesh, orbax checkpointing with rolling retention, and the
epoch-driven trainer loop (reference tools/train_utils/; SURVEY.md L6)."""

from .optim import build_optimizer_and_schedule
from .train_state import TrainState, create_train_state
from .trainer import Trainer
from . import checkpoint

__all__ = [
    "build_optimizer_and_schedule",
    "TrainState",
    "create_train_state",
    "Trainer",
    "checkpoint",
]

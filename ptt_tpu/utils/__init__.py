"""Cross-cutting utilities: logging, seeding, meters, named stack timers
(reference ptt/utils/common_utils.py, ptt/utils/timer_utils.py; SURVEY.md LX)."""

from .common import AverageMeter, MovingAverage, apply_platform_env, create_logger, set_manual_seed
from . import timer

__all__ = [
    "AverageMeter",
    "MovingAverage",
    "apply_platform_env",
    "create_logger",
    "set_manual_seed",
    "timer",
]

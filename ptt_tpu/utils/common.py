"""Common utilities (reference ptt/utils/common_utils.py).

Rank-aware logging (reference :223-236), determinism seeding (:115-124), and the
running-statistics meters used by the train loop (:15-77).  The torch/cudnn
determinism flags have no TPU analog — XLA is deterministic for a fixed program; the
host-side randomness that matters (numpy crop/resample RNG) is seeded here.
"""

from __future__ import annotations

import logging
import random
from collections import deque

import numpy as np


def apply_platform_env():
    """Re-assert the ``JAX_PLATFORMS`` env contract before first backend use.

    Some session images register a PJRT plugin from sitecustomize that
    force-selects its own platform at import time, silently overriding the
    documented env var — a subprocess launched with ``JAX_PLATFORMS=cpu`` then
    still initializes the accelerator backend (and hangs forever if that
    backend's tunnel is down). Called at CLI entry; a no-op when the var is
    unset or already in effect."""
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:  # pragma: no cover - backend already initialized
            pass


def create_logger(log_file=None, rank: int = 0, log_level=logging.INFO):
    """Console+file logger; non-zero ranks only log errors (reference :223-236)."""
    logger = logging.getLogger(f"ptt_tpu.rank{rank}.{log_file}")
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    if logger.handlers:
        return logger
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    console = logging.StreamHandler()
    console.setLevel(log_level if rank == 0 else logging.ERROR)
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file is not None:
        file_handler = logging.FileHandler(str(log_file))
        file_handler.setLevel(log_level if rank == 0 else logging.ERROR)
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)
    return logger


def set_manual_seed(seed: int):
    """Seed every host-side RNG (reference :115-124). Device-side randomness in JAX
    is explicit (PRNG keys), so there is nothing global to pin there."""
    random.seed(seed)
    np.random.seed(seed)


class MovingAverage:
    """Windowed moving average (reference :15-55)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.reset()

    def reset(self):
        self._values = deque()
        self._sum = 0.0

    def append(self, value):
        value = float(value)
        if np.isfinite(value):
            self._values.append(value)
            self._sum += value
            if len(self._values) > self.window:
                self._sum -= self._values.popleft()

    def get_avg(self):
        return self._sum / max(1, len(self._values))

    def __len__(self):
        return len(self._values)


class AverageMeter:
    """Running mean/current value (reference :58-75)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(1, self.count)

"""Multi-host helpers (reference common_utils.py:248-330).

The reference's distributed plumbing is NCCL process groups with TCP/SLURM
rendezvous plus a filesystem-based result gather (`merge_results_dist`: barrier +
per-rank pickle + rank-0 merge). The jax-native equivalents:

  - ``init_distributed``: jax.distributed.initialize (coordinator from env vars or
    explicit args) — one call replaces init_dist_pytorch/init_dist_slurm;
  - ``get_dist_info``: (process_index, process_count);
  - ``all_gather_object`` / ``merge_metric_lists``: gather small per-host python
    objects via a device all_gather of fixed-size arrays — no pickle tmpdir, no
    barrier files.
"""

from __future__ import annotations

import numpy as np


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host init (reference init_dist_pytorch/_slurm). With no args, reads the
    standard JAX env vars (JAX_COORDINATOR_ADDRESS etc.) or cloud autodetection."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return get_dist_info()


def get_dist_info():
    """(rank, world_size) (reference get_dist_info, common_utils.py:292)."""
    import jax

    return jax.process_index(), jax.process_count()


def all_gather_array(x: np.ndarray) -> np.ndarray:
    """Gather one fixed-shape per-host array to every host: (world, *x.shape).
    Single-process: returns x[None]."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def merge_metric_lists(values) -> np.ndarray:
    """Gather variable-length per-host metric lists (e.g. per-frame overlaps) into
    one flat array on every host — the reference's merge_results_dist
    (common_utils.py:309-330) without the pickle tmpdir + barrier.

    Pads to the max length for the fixed-shape all_gather, then slices each
    gathered row back to its true per-host length (gathered alongside) — a NaN
    metric value from a host (e.g. a degenerate-box IoU) survives the merge
    instead of being dropped with the padding.
    """
    values = np.asarray(list(values), np.float64)
    n = np.int64(values.shape[0])
    lengths = all_gather_array(np.asarray(n))  # (world,)
    max_n = int(lengths.max()) if lengths.size else 0
    padded = np.zeros(max_n)
    padded[: len(values)] = values
    gathered = all_gather_array(padded)  # (world, max_n)
    return np.concatenate(
        [row[: int(k)] for row, k in zip(gathered, np.atleast_1d(lengths))]
    ) if max_n else values

"""Parallelism utilities over jax.sharding meshes.

Two axes of scale (SURVEY.md §2.3, §5):
  - data parallelism: the pjit-sharded train step (ptt_tpu.train.train_state) —
    batch sharded over the mesh, params replicated, XLA inserts the gradient
    all-reduce over ICI; re-exported here as the canonical API;
  - point-axis (sequence) parallelism: the reference caps clouds at 1024 points so
    its O(N^2) distance/attention is tiny; for Waymo-scale search regions the point
    dimension itself shards over the mesh (sharded_ops) — each device owns a slice
    of query points against replicated reference points, the exact analog of
    sequence-parallel attention for point clouds.
"""

from ..train.train_state import make_data_mesh, make_sharded_train_step, shard_batch
from .sharded_ops import (
    sharded_knn,
    sharded_square_distance,
    sharded_vector_attention,
)

__all__ = [
    "make_data_mesh",
    "make_sharded_train_step",
    "shard_batch",
    "sharded_knn",
    "sharded_square_distance",
    "sharded_vector_attention",
]

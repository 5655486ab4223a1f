"""PTT-TPU: a TPU-native framework for 3D single-object tracking on LiDAR point clouds.

Built from scratch in JAX/XLA/Pallas with the same capabilities and public surface as
the reference PTT (Point-Track-Transformer, IROS 2021; reference layout surveyed in
SURVEY.md): YAML-config-driven Siamese template/search tracking with a PointNet++
set-abstraction backbone, P2B cosine-similarity fusion, VoteNet-style centroid/box
voting heads, and point-transformer attention blocks.

Design stance (TPU-first, not a port):
  - static shapes everywhere (fixed 1024/512 point clouds), channel-last layout so the
    feature dimension rides the 128-wide TPU lanes;
  - pure functional model: ``apply(params, batch, train)`` built with flax.linen;
  - point ops (FPS, ball query, grouping, kNN, 3-NN interpolation) as jittable
    jax.numpy primitives with Pallas TPU kernels for the hot paths;
  - data parallelism via ``jax.sharding.Mesh`` + jit with sharded batches (XLA
    collectives over ICI), not NCCL process groups.
"""

from .version import __version__  # noqa: E402,F401

"""TPU-native point-cloud ops.

Equivalents of the reference's CUDA kernel surface (pointnet2_ops ``_ext`` calls wrapped
at ptt/models/backbones_3d/pointnet2/pointnet2_utils.py:27-429), as jittable
channel-last jax.numpy primitives, with Pallas TPU kernels for the hot paths
(``ptt_tpu.ops.pallas``).  All outputs are fixed-shape (pad+duplicate semantics match
the CUDA kernels) so everything compiles to static-shape XLA.
"""

from .point_ops import (
    square_distance,
    furthest_point_sample_with_dist,
    gather_points,
    ball_query,
    group_points,
    group_all,
    query_and_group,
    uniform_resample_idx,
    knn,
    three_nn,
    three_interpolate,
)

# FPS dispatches to the Pallas TPU kernel on TPU (3x the jnp fori_loop there, exact
# same indices), jnp elsewhere; see pallas_fps.py for the kernel design.
from .pallas_fps import furthest_point_sample, furthest_point_sample_pair

__all__ = [
    "square_distance",
    "furthest_point_sample",
    "furthest_point_sample_pair",
    "furthest_point_sample_with_dist",
    "gather_points",
    "ball_query",
    "group_points",
    "group_all",
    "query_and_group",
    "uniform_resample_idx",
    "knn",
    "three_nn",
    "three_interpolate",
]

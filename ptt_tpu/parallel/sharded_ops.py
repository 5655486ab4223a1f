"""Point-axis (sequence-parallel) sharded ops via shard_map.

The reference caps clouds at 1024 points, so its O(N^2) ``square_distance`` and kNN
attention stay tiny (SURVEY.md §5 "long-context" — absent). For Waymo-scale search
regions (tens of thousands of points) the point dimension itself becomes the
sequence axis to shard: each device owns a contiguous slice of QUERY points and
computes distances / neighborhoods / attention against the full (replicated)
reference points. No collectives are needed inside the op — queries are
independent — so this scales linearly over ICI; only the initial reference
replication (an all-gather XLA inserts from the shardings) is communication.

All three ops return bit-identical results to their unsharded counterparts; the
tests run them on the 8-device virtual CPU mesh.

Two ways to use this:
  - implicit (the model path): install a point mesh with
    ``ops.mesh_ctx.use_point_mesh(mesh)`` — ``ops.square_distance`` / ``ops.knn``
    / ``ops.ball_query`` then route large-N calls through shard_map themselves,
    so the whole network (SA ball queries, transformer kNN, ffps distances)
    shards without model changes. The POINT_SHARDING block of
    ``tools/cfgs/kitti_models/ptt_waymo.yaml`` turns this on in the eval CLI.
  - explicit (this module): call the ``sharded_*`` wrappers with the mesh in
    hand, e.g. from custom pipelines that manage their own shardings.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 top-level API (check_vma kwarg); experimental path for older
    from jax import shard_map as _raw_shard_map

    def _shard_map(fn, mesh, in_specs, out_specs):
        return _raw_shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _raw_shard_map

    def _shard_map(fn, mesh, in_specs, out_specs):
        return _raw_shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )

from ..nn.layers import MLP2  # noqa: F401  (re-exported for sharded attention users)
from ..ops import point_ops


def _point_sharded(mesh: Mesh, axis: str, fn, n_in_sharded: int = 1, n_in_replicated: int = 1):
    """shard_map wrapper: first ``n_in_sharded`` args sharded on their 2nd dim
    (B, N, ...), the rest replicated; output sharded on its 2nd dim.
    Delegates to the one spec-construction site (ops.mesh_ctx.shard_pointwise)."""
    from ..ops import mesh_ctx

    return mesh_ctx.shard_pointwise(fn, mesh, axis, n_in_sharded, n_in_replicated)


def sharded_square_distance(query, ref, mesh: Mesh, axis: str = "data"):
    """(B, Nq, 3) x (B, Nr, 3) -> (B, Nq, Nr) with Nq sharded over the mesh."""
    fn = _point_sharded(mesh, axis, lambda q, r: point_ops._square_distance_raw(q, r))
    return fn(query, ref)


def sharded_knn(k: int, query, ref, mesh: Mesh, axis: str = "data"):
    """k nearest reference indices per query point, query axis sharded."""
    fn = _point_sharded(mesh, axis, functools.partial(point_ops._knn_impl, k))
    return fn(query, ref)


def sharded_ball_query(radius: float, nsample: int, xyz, new_xyz, mesh: Mesh,
                       axis: str = "data"):
    """Ball query with the CENTERS sharded over the mesh (xyz replicated)."""

    def _bq(centers, pts):
        return point_ops._ball_query_impl(radius, nsample, pts, centers)

    fn = _point_sharded(mesh, axis, _bq)
    return fn(new_xyz, xyz)


def sharded_vector_attention(apply_fn, variables, xyz, features, mesh: Mesh,
                             axis: str = "data", k: int = 16):
    """Run a kNN vector-attention block with the point axis sharded.

    ``apply_fn(variables, xyz_shard, feats_shard, xyz_full, feats_full,
    knn_idx_shard) -> out_shard`` is the per-shard computation; this helper
    handles the sharded kNN against the full point set and the sharding
    plumbing. For the stock model blocks, prefer the implicit route instead:
    install ``ops.mesh_ctx.use_point_mesh(mesh)`` and the blocks' own
    ``ops.knn`` calls shard themselves (tests/test_parallel.py).
    """

    def _one(xyz_shard, feats_shard, xyz_full, feats_full):
        idx = point_ops._knn_impl(k, xyz_shard, xyz_full)
        return apply_fn(variables, xyz_shard, feats_shard, xyz_full, feats_full, idx)

    fn = _shard_map(
        _one, mesh, (P(None, axis), P(None, axis), P(), P()), P(None, axis)
    )
    return fn(xyz, features, xyz, features)


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_points(x, mesh: Mesh, axis: str = "data"):
    """Place (B, N, ...) on the mesh with N sharded."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis)))

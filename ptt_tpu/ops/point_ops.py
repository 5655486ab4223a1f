"""Reference jax.numpy implementations of the point-cloud kernel set.

Semantics match the CUDA kernels the reference calls through
``ptt/models/backbones_3d/pointnet2/pointnet2_utils.py`` (see SURVEY.md section 2.2):

  - ``furthest_point_sample``            ~ _ext.furthest_point_sampling (first index 0)
  - ``furthest_point_sample_with_dist``  ~ _ext.furthest_point_sampling_with_dist
  - ``gather_points``                    ~ _ext.gather_points (+ scatter-add vjp, which
                                           JAX derives automatically from the gather)
  - ``ball_query``                       ~ _ext.ball_query: <= nsample in-radius
                                           neighbors in ascending point order, rows
                                           padded with the FIRST in-radius index
  - ``group_points``                     ~ _ext.group_points (+ vjp)
  - ``three_nn`` / ``three_interpolate`` ~ _ext.three_nn / three_interpolate (+ vjp)
  - ``knn``                              ~ square_distance + argsort[:, :, :k]
                                           (variants.py:150-151) — returns the k nearest
                                           including self, ties broken by lower index

Layout is channel-LAST everywhere — features are ``(B, N, C)`` so C rides the TPU
lane dimension — whereas the reference is channel-first ``(B, C, N)``.

Everything here is jittable, differentiable where the reference op has a backward
(gather/group/interpolate), and free of data-dependent shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from . import mesh_ctx


# Point-axis sharding: when an entry point installs a point mesh
# (ops.mesh_ctx.use_point_mesh — the POINT_SHARDING configs), the O(N^2)
# neighborhood ops below split their query/center rows over the mesh via
# shard_map (rows are independent; reference points replicate). Dims smaller
# than this stay local — splitting a 128-seed kNN adds dispatch overhead for
# nothing.
MIN_SHARD_POINTS = 512


_declined_shapes: set = set()


def _point_mesh_for(dim_size: int):
    """(mesh, axis) when the installed point mesh should split ``dim_size`` rows."""
    mesh, axis = mesh_ctx.get_point_mesh()
    if mesh is None:
        return None, None
    n_shards = mesh.shape[axis]
    if dim_size < MIN_SHARD_POINTS:
        return None, None
    if dim_size % n_shards:
        # large enough to shard but not divisible: the op silently running
        # replicated is the worst of both worlds (fused kernels are also off
        # under a point mesh) — surface it once per shape
        key = (dim_size, n_shards)
        if key not in _declined_shapes:
            _declined_shapes.add(key)
            import warnings

            warnings.warn(
                f"point sharding declined: {dim_size} rows not divisible by the "
                f"{n_shards}-way '{axis}' mesh axis — this op runs replicated; "
                f"pad the config's point counts to a multiple of {n_shards}",
                stacklevel=3,
            )
        return None, None
    return mesh, axis


def _square_distance_raw(src: jnp.ndarray, dst: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    if exact:
        return jnp.sum((src[:, :, None, :] - dst[:, None, :, :]) ** 2, axis=-1)
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)  # (B, N, 1)
    d2 = jnp.sum(dst * dst, axis=-1, keepdims=True)  # (B, M, 1)
    # HIGHEST precision: fp32 accumulation on the MXU. Distances feed radius thresholds
    # and kNN ordering; bf16 rounding here would reorder neighbors vs. the reference.
    cross = jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    return jnp.maximum(s2 + jnp.swapaxes(d2, 1, 2) - 2.0 * cross, 0.0)


def square_distance(src: jnp.ndarray, dst: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    """Pairwise squared euclidean distance.

    Args:
      src: (B, N, C); dst: (B, M, C).
      exact: if True, use the elementwise broadcast form (bit-matching the reference's
        ``sum((a-b)**2)``); otherwise the matmul form ``|a|^2+|b|^2-2ab`` which runs on
        the MXU and clamps tiny negative round-off at 0.

    Under an installed point mesh (mesh_ctx.use_point_mesh) and a large enough N,
    the src rows split over the mesh (bit-identical — each row's reduction is
    unchanged).

    Returns: (B, N, M) float32.
    """
    mesh, axis = _point_mesh_for(src.shape[1])
    if mesh is not None:
        fn = functools.partial(_square_distance_raw, exact=exact)
        return mesh_ctx.shard_pointwise(fn, mesh, axis, 1, 1)(src, dst)
    return _square_distance_raw(src, dst, exact=exact)


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative farthest point sampling.

    Starts from index 0 and greedily adds the point that maximizes the min distance
    to the chosen set — the same greedy schedule as the CUDA kernel (which hardwires
    ``idxs[0] = 0``). Sequential over npoint by nature; vectorized over batch and N.

    Args:
      xyz: (B, N, 3).
    Returns:
      (B, npoint) int32 indices.
    """
    xyz = xyz.astype(jnp.float32)
    B, N, _ = xyz.shape

    def body(i, state):
        min_d2, farthest, idxs = state
        idxs = idxs.at[:, i].set(farthest)
        cur = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # (B, 1, 3)
        d2 = jnp.sum((xyz - cur) ** 2, axis=-1)  # (B, N)
        min_d2 = jnp.minimum(min_d2, d2)
        farthest = jnp.argmax(min_d2, axis=-1).astype(jnp.int32)
        return min_d2, farthest, idxs

    init = (
        jnp.full((B, N), 1e10, dtype=jnp.float32),
        jnp.zeros((B,), dtype=jnp.int32),
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, idxs = lax.fori_loop(0, npoint, body, init)
    return idxs


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample_with_dist(dist2: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """FPS on a precomputed (B, N, N) squared-distance matrix ('ffps' feature-space
    sampling, reference pointnet2_modules.py:64-67)."""
    dist2 = dist2.astype(jnp.float32)
    B, N, _ = dist2.shape

    def body(i, state):
        min_d2, farthest, idxs = state
        idxs = idxs.at[:, i].set(farthest)
        d2 = jnp.take_along_axis(dist2, farthest[:, None, None], axis=1)[:, 0, :]  # (B, N)
        min_d2 = jnp.minimum(min_d2, d2)
        farthest = jnp.argmax(min_d2, axis=-1).astype(jnp.int32)
        return min_d2, farthest, idxs

    init = (
        jnp.full((B, N), 1e10, dtype=jnp.float32),
        jnp.zeros((B,), dtype=jnp.int32),
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, idxs = lax.fori_loop(0, npoint, body, init)
    return idxs


# ---------------------------------------------------------------------------
# Gather / group
# ---------------------------------------------------------------------------


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather: (B, N, C) x (B, M) int -> (B, M, C).

    The vjp is the scatter-add the CUDA gather_points_grad implements; JAX derives it
    from take_along_axis automatically.
    """
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched neighborhood gather: (B, N, C) x (B, np, ns) int -> (B, np, ns, C)."""
    B, npoint, nsample = idx.shape
    flat = gather_points(points, idx.reshape(B, npoint * nsample))
    return flat.reshape(B, npoint, nsample, points.shape[-1])


# ---------------------------------------------------------------------------
# Neighborhoods
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("radius", "nsample"))
def _ball_query_impl(radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray) -> jnp.ndarray:
    d2 = _square_distance_raw(new_xyz, xyz)  # (B, M, N)
    N = xyz.shape[1]
    in_ball = d2 < (radius * radius)
    order = lax.broadcasted_iota(jnp.int32, d2.shape, dimension=2)
    # In-radius points keep their index as sort key; out-of-radius get key N + index,
    # so the ascending-k smallest keys are exactly the first nsample in-radius indices.
    key = jnp.where(in_ball, order, order + N)
    k = min(nsample, N)
    # NOTE: lax.approx_min_k(recall_target=1.0) is exact here (distinct integer keys)
    # and 2.5x faster in isolation, but measurably SLOWER inside the full model
    # (worse fusion with the surrounding gather/MLP); keep top_k (docs/PERFORMANCE.md)
    neg_topk, _ = lax.top_k(-key, k)  # k smallest keys
    key_sorted = -neg_topk
    valid = key_sorted < N
    idx = jnp.where(valid, key_sorted, key_sorted - N)
    first = idx[..., :1]
    idx = jnp.where(valid, idx, first)
    if k < nsample:  # more slots than points: extend with the pad index
        idx = jnp.concatenate([idx, jnp.broadcast_to(first, (*idx.shape[:-1], nsample - k))], axis=-1)
    return idx.astype(jnp.int32)


def ball_query(radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray) -> jnp.ndarray:
    """Fixed-size ball neighborhoods.

    For each center, the indices of up to ``nsample`` points within ``radius``, in
    ascending original-point order; rows with fewer than ``nsample`` hits are padded
    with the first in-radius index — duplicate-pad semantics identical to the CUDA
    ball_query, so downstream max-pools see the same multiset of neighbors.

    Under an installed point mesh the CENTER rows split over the mesh (bit-identical:
    each center's neighborhood is computed against the full replicated cloud).

    Args:
      xyz: (B, N, 3) all points; new_xyz: (B, M, 3) centers.
    Returns:
      (B, M, nsample) int32.
    """
    mesh, axis = _point_mesh_for(new_xyz.shape[1])
    if mesh is not None:
        def _bq(centers, pts):
            return _ball_query_impl(radius, nsample, pts, centers)

        return mesh_ctx.shard_pointwise(_bq, mesh, axis, 1, 1)(new_xyz, xyz)
    return _ball_query_impl(radius, nsample, xyz, new_xyz)


def uniform_resample_idx(idx: jnp.ndarray, key) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Re-fill each ball-query row with a uniform resample of its UNIQUE members
    (reference QueryAndGroup(sample_uniformly=True), pointnet2_utils.py:319-327).

    ball_query pads short rows by repeating the first in-radius index, which biases
    downstream averages toward that point; the reference variant instead places the
    sorted unique indices first and fills the remaining slots uniformly at random
    from them. The torch original is a per-region Python loop over torch.unique —
    here it is one fixed-shape sort + masked compaction + vectorized randint, which
    vmaps/jits over (B, M) regions at once.

    Args:
      idx: (B, M, ns) int32 from ball_query; key: jax PRNG key.
    Returns:
      (resampled idx (B, M, ns) int32, unique_cnt (B, M) float32).
    """
    ns = idx.shape[-1]
    srt = jnp.sort(idx, axis=-1)
    first = jnp.concatenate(
        [jnp.ones_like(srt[..., :1], bool), srt[..., 1:] != srt[..., :-1]], axis=-1
    )
    cnt = first.sum(axis=-1)  # (B, M) unique members per region
    # compact the sorted-unique values to the front: stable argsort on a rank that
    # is the unique position for first-occurrences and ns (past the end) otherwise
    rank = jnp.where(first, jnp.cumsum(first, axis=-1) - 1, ns)
    order = jnp.argsort(rank, axis=-1, stable=True)
    unique = jnp.take_along_axis(srt, order, axis=-1)  # first cnt entries valid
    r = jax.random.randint(key, idx.shape, 0, cnt[..., None])
    fill = jnp.take_along_axis(unique, r, axis=-1)
    slots = lax.broadcasted_iota(jnp.int32, idx.shape, dimension=idx.ndim - 1)
    out = jnp.where(slots < cnt[..., None], unique, fill)
    return out.astype(jnp.int32), cnt.astype(jnp.float32)


def query_and_group(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    features: jnp.ndarray | None,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    sample_uniformly: bool = False,
    ret_unique_cnt: bool = False,
    key=None,
):
    """Ball query + grouping (reference QueryAndGroup, pointnet2_utils.py:297-380).

    Args:
      xyz: (B, N, 3); new_xyz: (B, M, 3); features: (B, N, C) or None.
      sample_uniformly: re-fill duplicate pad slots uniformly from each region's
        unique members (pointnet2_utils.py:319-327); needs ``key``.
      ret_unique_cnt: also return the per-region unique-member count (requires
        sample_uniformly, like the reference's assert).
    Returns:
      (grouped (B, M, nsample, 3+C or C or 3), grouped_xyz (B, M, nsample, 3), idx)
      [+ unique_cnt (B, M) when ret_unique_cnt].
    """
    if ret_unique_cnt:
        assert sample_uniformly, "ret_unique_cnt requires sample_uniformly"
    idx = ball_query(radius, nsample, xyz, new_xyz)
    unique_cnt = None
    if sample_uniformly:
        assert key is not None, "sample_uniformly needs a PRNG key"
        idx, unique_cnt = uniform_resample_idx(idx, key)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius

    if features is not None:
        grouped_feats = group_points(features, idx)
        if use_xyz:
            new_features = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        else:
            new_features = grouped_feats
    else:
        assert use_xyz, "cannot have neither features nor xyz"
        new_features = grouped_xyz
    if ret_unique_cnt:
        return new_features, grouped_xyz, idx, unique_cnt
    return new_features, grouped_xyz, idx


def group_all(xyz: jnp.ndarray, features: jnp.ndarray | None, use_xyz: bool = True):
    """Group the whole cloud into one region (reference GroupAll,
    pointnet2_utils.py:383-429) — the SA-module degenerate used when npoint is
    None. Channel-last: the reference's (B, 3+C, 1, N) is (B, 1, N, 3+C) here.

    Args:
      xyz: (B, N, 3); features: (B, N, C) or None.
    Returns:
      (grouped (B, 1, N, 3+C|C|3), grouped_xyz (B, 1, N, 3)) — grouped_xyz is
      the RAW coordinates (the reference does not center on a query point).
    """
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped_feats = features[:, None, :, :]
        if use_xyz:
            new_features = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        else:
            new_features = grouped_feats
    else:
        new_features = grouped_xyz
    return new_features, grouped_xyz


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_impl(k: int, query: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    d2 = _square_distance_raw(query, ref)
    _, idx = lax.top_k(-d2, k)
    return idx.astype(jnp.int32)


def knn(k: int, query: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """k nearest neighbors of each query point among ref points (self included when
    query is ref) — the transformer blocks' ``square_distance().argsort()[..., :k]``
    (reference variants.py:150-151). Ties break toward the lower index (top_k is
    stable), matching a stable argsort.

    Under an installed point mesh the QUERY rows split over the mesh (bit-identical:
    each query row's top_k runs against the full replicated ref cloud).

    Returns: (B, Nq, k) int32.
    """
    mesh, axis = _point_mesh_for(query.shape[1])
    if mesh is not None:
        return mesh_ctx.shard_pointwise(
            functools.partial(_knn_impl, k), mesh, axis, 1, 1
        )(query, ref)
    return _knn_impl(k, query, ref)


@jax.jit
def _three_nn_impl(unknown: jnp.ndarray, known: jnp.ndarray):
    d2 = _square_distance_raw(unknown, known)
    neg, idx = lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """Three nearest neighbors of each unknown point among known points.

    Returns (dist (B, n, 3), idx (B, n, 3) int32) — dist is EUCLIDEAN (not squared),
    matching _ext.three_nn. Unknown rows split over an installed point mesh like
    the other O(N^2) neighborhood ops.
    """
    mesh, axis = _point_mesh_for(unknown.shape[1])
    if mesh is not None:
        return mesh_ctx.shard_pointwise(_three_nn_impl, mesh, axis, 1, 1, n_out=2)(
            unknown, known
        )
    return _three_nn_impl(unknown, known)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted 3-NN feature interpolation: (B, M, C) x (B, n, 3) x (B, n, 3) -> (B, n, C).

    Differentiable; the vjp is the scatter-add of _ext.three_interpolate_grad.
    """
    gathered = group_points(features, idx)  # (B, n, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)

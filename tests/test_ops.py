"""Point-op tests against straightforward numpy oracles.

The oracles re-state the CUDA kernel semantics the reference depends on
(pointnet2_ops; call surface at ptt/models/backbones_3d/pointnet2/pointnet2_utils.py):
FPS starting at index 0, ball query with ascending-order first-fit + first-hit
padding, stable kNN, 3-NN interpolation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptt_tpu import ops


# ---------------------------------------------------------------------------
# numpy oracles
# ---------------------------------------------------------------------------


def np_fps(xyz, npoint):
    N = xyz.shape[0]
    idxs = np.zeros(npoint, dtype=np.int64)
    min_d2 = np.full(N, 1e10)
    farthest = 0
    for i in range(npoint):
        idxs[i] = farthest
        d2 = np.sum((xyz - xyz[farthest]) ** 2, axis=-1)
        min_d2 = np.minimum(min_d2, d2)
        farthest = int(np.argmax(min_d2))
    return idxs


def np_ball_query(radius, nsample, xyz, centers):
    M = centers.shape[0]
    out = np.zeros((M, nsample), dtype=np.int64)
    for i in range(M):
        cnt = 0
        for j in range(xyz.shape[0]):
            if np.sum((xyz[j] - centers[i]) ** 2) < radius**2:
                if cnt == 0:
                    out[i, :] = j
                out[i, cnt] = j
                cnt += 1
                if cnt == nsample:
                    break
    return out


def np_knn(k, query, ref):
    d2 = np.sum((query[:, None, :] - ref[None, :, :]) ** 2, axis=-1)
    return np.argsort(d2, axis=-1, kind="stable")[:, :k]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_square_distance_matches_exact(rng):
    a = rng.standard_normal((2, 37, 3)).astype(np.float32)
    b = rng.standard_normal((2, 53, 3)).astype(np.float32)
    fast = ops.square_distance(jnp.array(a), jnp.array(b))
    exact = ops.square_distance(jnp.array(a), jnp.array(b), exact=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-4)


def test_fps_matches_oracle(rng):
    xyz = rng.standard_normal((3, 64, 3)).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.array(xyz), 16))
    for b in range(3):
        np.testing.assert_array_equal(got[b], np_fps(xyz[b], 16))


def test_fps_with_dist_matches_plain_fps(rng):
    xyz = rng.standard_normal((2, 48, 3)).astype(np.float32)
    d2 = np.asarray(ops.square_distance(jnp.array(xyz), jnp.array(xyz), exact=True))
    got = np.asarray(ops.furthest_point_sample_with_dist(jnp.array(d2), 12))
    want = np.asarray(ops.furthest_point_sample(jnp.array(xyz), 12))
    np.testing.assert_array_equal(got, want)


def test_fps_spreads_points():
    # 4 well-separated clusters: FPS of 4 from 400 points must pick one per cluster.
    rng = np.random.default_rng(1)
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [10, 10, 0]], dtype=np.float32)
    pts = np.concatenate([c + 0.1 * rng.standard_normal((100, 3)).astype(np.float32) for c in centers])
    idx = np.asarray(ops.furthest_point_sample(jnp.array(pts[None]), 4))[0]
    picked_cluster = idx // 100
    assert len(set(picked_cluster.tolist())) == 4


def test_ball_query_matches_oracle(rng):
    xyz = rng.standard_normal((2, 128, 3)).astype(np.float32)
    centers = xyz[:, :32]
    got = np.asarray(ops.ball_query(0.8, 8, jnp.array(xyz), jnp.array(centers)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], np_ball_query(0.8, 8, xyz[b], centers[b]))


def test_ball_query_pads_with_first_hit(rng):
    # One isolated center: every slot must be the center itself.
    xyz = np.array([[[0, 0, 0], [100, 100, 100], [200, 200, 200]]], dtype=np.float32)
    centers = np.array([[[100, 100, 100]]], dtype=np.float32)
    got = np.asarray(ops.ball_query(0.5, 4, jnp.array(xyz), jnp.array(centers)))
    np.testing.assert_array_equal(got[0, 0], [1, 1, 1, 1])


def test_knn_matches_oracle(rng):
    q = rng.standard_normal((2, 40, 3)).astype(np.float32)
    got = np.asarray(ops.knn(5, jnp.array(q), jnp.array(q)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], np_knn(5, q[b], q[b]))
    # self is always the nearest neighbor
    np.testing.assert_array_equal(got[..., 0], np.arange(40)[None].repeat(2, 0))


def test_gather_and_group(rng):
    feats = rng.standard_normal((2, 10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(2, 5)).astype(np.int32)
    got = np.asarray(ops.gather_points(jnp.array(feats), jnp.array(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], feats[b][idx[b]])

    gidx = rng.integers(0, 10, size=(2, 5, 3)).astype(np.int32)
    got = np.asarray(ops.group_points(jnp.array(feats), jnp.array(gidx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], feats[b][gidx[b]])


def test_gather_grad_is_scatter_add(rng):
    feats = jnp.array(rng.standard_normal((1, 6, 2)).astype(np.float32))
    idx = jnp.array([[0, 0, 3]], dtype=jnp.int32)

    def f(x):
        return jnp.sum(ops.gather_points(x, idx))

    g = np.asarray(jax.grad(f)(feats))[0]
    np.testing.assert_array_equal(g[:, 0], [2, 0, 0, 1, 0, 0])


def test_three_nn_and_interpolate(rng):
    unknown = rng.standard_normal((1, 20, 3)).astype(np.float32)
    known = rng.standard_normal((1, 8, 3)).astype(np.float32)
    dist, idx = ops.three_nn(jnp.array(unknown), jnp.array(known))
    dist, idx = np.asarray(dist), np.asarray(idx)
    d2 = np.sum((unknown[0][:, None] - known[0][None]) ** 2, -1)
    want = np.argsort(d2, -1, kind="stable")[:, :3]
    np.testing.assert_array_equal(idx[0], want)
    np.testing.assert_allclose(dist[0], np.sqrt(np.take_along_axis(d2, want, -1)), rtol=1e-4)

    feats = rng.standard_normal((1, 8, 5)).astype(np.float32)
    # reference weighting: 1/d normalized
    w = 1.0 / np.maximum(dist, 1e-8)
    w = w / w.sum(-1, keepdims=True)
    out = np.asarray(ops.three_interpolate(jnp.array(feats), jnp.array(idx), jnp.array(w)))
    want_feats = (feats[0][idx[0]] * w[0][..., None]).sum(1)
    np.testing.assert_allclose(out[0], want_feats, rtol=1e-5)


def test_query_and_group_shapes_and_normalization(rng):
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
    centers = xyz[:, :16]
    feats = rng.standard_normal((2, 64, 7)).astype(np.float32)
    grouped, gxyz, idx = ops.query_and_group(
        0.5, 8, jnp.array(xyz), jnp.array(centers), jnp.array(feats), use_xyz=True, normalize_xyz=True
    )
    assert grouped.shape == (2, 16, 8, 10)
    assert gxyz.shape == (2, 16, 8, 3)
    # normalized relative coords are within the unit ball (strict radius comparison)
    norms = np.linalg.norm(np.asarray(gxyz), axis=-1)
    assert (norms < 1.0 + 1e-5).all()
    # first 3 channels of grouped are the (normalized) relative xyz
    np.testing.assert_array_equal(np.asarray(grouped[..., :3]), np.asarray(gxyz))


def test_query_and_group_sample_uniformly(rng):
    """sample_uniformly re-fills the duplicate pad slots from each region's
    unique members (reference QueryAndGroup(sample_uniformly=True, ret_unique_cnt),
    pointnet2_utils.py:310-339): every resampled index must be in-radius, the
    unique count must match the true in-radius membership, and the unique
    members must all be retained."""
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
    centers = xyz[:, :16]
    feats = rng.standard_normal((2, 64, 5)).astype(np.float32)
    radius, ns = 0.8, 8
    key = jax.random.PRNGKey(7)

    plain_idx = np.asarray(ops.ball_query(radius, ns, jnp.array(xyz), jnp.array(centers)))
    grouped, gxyz, idx, cnt = ops.query_and_group(
        radius, ns, jnp.array(xyz), jnp.array(centers), jnp.array(feats),
        sample_uniformly=True, ret_unique_cnt=True, key=key,
    )
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    assert grouped.shape == (2, 16, ns, 8) and cnt.shape == (2, 16)
    for b in range(2):
        for m in range(16):
            uniq_plain = set(plain_idx[b, m].tolist())
            uniq_new = set(idx[b, m].tolist())
            assert uniq_new == uniq_plain  # same membership, no invented indices
            assert cnt[b, m] == len(uniq_plain)
    # the grouped features are consistent with the resampled indices
    want = feats[np.arange(2)[:, None, None], idx]
    np.testing.assert_allclose(np.asarray(grouped[..., 3:]), want, rtol=1e-6)

    # ret_unique_cnt without sample_uniformly mirrors the reference's assert
    with pytest.raises(AssertionError):
        ops.query_and_group(radius, ns, jnp.array(xyz), jnp.array(centers), None,
                            ret_unique_cnt=True)


def test_group_all(rng):
    """GroupAll degenerate (reference pointnet2_utils.py:383-429): one region
    holding the raw cloud, channel-last."""
    xyz = rng.standard_normal((2, 32, 3)).astype(np.float32)
    feats = rng.standard_normal((2, 32, 6)).astype(np.float32)
    grouped, gxyz = ops.group_all(jnp.array(xyz), jnp.array(feats), use_xyz=True)
    assert grouped.shape == (2, 1, 32, 9)
    np.testing.assert_array_equal(np.asarray(gxyz)[:, 0], xyz)
    np.testing.assert_array_equal(np.asarray(grouped)[..., :3][:, 0], xyz)
    np.testing.assert_array_equal(np.asarray(grouped)[..., 3:][:, 0], feats)
    only_feats, _ = ops.group_all(jnp.array(xyz), jnp.array(feats), use_xyz=False)
    assert only_feats.shape == (2, 1, 32, 6)
    only_xyz, _ = ops.group_all(jnp.array(xyz), None)
    assert only_xyz.shape == (2, 1, 32, 3)


def test_ops_are_jittable_on_batch():
    # everything compiles together under one jit with static shapes
    @jax.jit
    def pipeline(xyz, feats):
        idx = ops.furthest_point_sample(xyz, 16)
        centers = ops.gather_points(xyz, idx)
        grouped, _, _ = ops.query_and_group(0.7, 8, xyz, centers, feats)
        return grouped.sum()

    rng = np.random.default_rng(3)
    xyz = jnp.array(rng.standard_normal((2, 64, 3)).astype(np.float32))
    feats = jnp.array(rng.standard_normal((2, 64, 4)).astype(np.float32))
    out = pipeline(xyz, feats)
    assert np.isfinite(np.asarray(out))

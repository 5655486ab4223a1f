"""Point-axis (sequence-parallel) sharding tests on the 8-device virtual CPU mesh:
sharded ops must return bit-identical results to their unsharded counterparts, with
the query/point axis actually distributed across devices."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptt_tpu.ops import point_ops
from ptt_tpu.parallel import (
    make_data_mesh,
    sharded_knn,
    sharded_square_distance,
)
from ptt_tpu.parallel.sharded_ops import shard_points, sharded_ball_query


@pytest.fixture(scope="module")
def mesh():
    m = make_data_mesh()
    assert m.devices.size == 8
    return m


@pytest.fixture
def clouds(rng):
    q = jnp.asarray(rng.standard_normal((2, 1024, 3)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((2, 256, 3)), jnp.float32)
    return q, r


def test_sharded_square_distance(mesh, clouds):
    q, r = clouds
    ref = np.asarray(point_ops.square_distance(q, r))
    q_sh = shard_points(q, mesh)
    assert len(q_sh.sharding.device_set) == 8
    out = sharded_square_distance(q_sh, r, mesh)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_sharded_knn(mesh, clouds):
    q, r = clouds
    ref = np.asarray(point_ops.knn(16, q, r))
    out = sharded_knn(16, shard_points(q, mesh), r, mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_sharded_ball_query(mesh, clouds):
    q, r = clouds
    centers = r[:, :128]
    ref = np.asarray(point_ops.ball_query(0.9, 16, q, centers))
    out = sharded_ball_query(0.9, 16, q, shard_points(centers, mesh), mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_sharded_knn_large_cloud_scales(mesh, rng):
    """Waymo-scale stretch shape: 32k query points sharded 8 ways."""
    q = jnp.asarray(rng.standard_normal((1, 32768, 3)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((1, 2048, 3)), jnp.float32)
    out = sharded_knn(16, shard_points(q, mesh), r, mesh)
    assert out.shape == (1, 32768, 16)
    # spot-check a few rows against the dense computation
    ref = np.asarray(point_ops.knn(16, q[:, :64], r))
    np.testing.assert_array_equal(np.asarray(out[:, :64]), ref)

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


# ---------------------------------------------------------------------------
# Implicit route: ops dispatchers under an installed point mesh
# (ops/mesh_ctx.use_point_mesh) — the POINT_SHARDING / ptt_waymo model path.
# ---------------------------------------------------------------------------

from ptt_tpu.ops import mesh_ctx


@pytest.fixture
def point_mesh():
    m = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("point",))
    return m


def test_ops_dispatch_routes_large_rows(point_mesh, clouds):
    """With a point mesh installed, ops.knn/ball_query/square_distance split
    their >= MIN_SHARD_POINTS rows over the mesh and match the local results."""
    q, r = clouds  # q has 1024 rows >= MIN_SHARD_POINTS
    ref_knn = np.asarray(point_ops.knn(16, q, r))
    ref_bq = np.asarray(point_ops.ball_query(0.9, 16, r, q))
    ref_d2 = np.asarray(point_ops.square_distance(q, r))
    with mesh_ctx.use_point_mesh(point_mesh):
        out_knn = point_ops.knn(16, q, r)
        out_bq = point_ops.ball_query(0.9, 16, r, q)  # centers = q (1024 rows)
        out_d2 = point_ops.square_distance(q, r)
        # actually distributed: outputs land sharded over the point axis
        for out in (out_knn, out_bq, out_d2):
            assert len(out.sharding.device_set) == 8, out.sharding
    np.testing.assert_array_equal(np.asarray(out_knn), ref_knn)
    np.testing.assert_array_equal(np.asarray(out_bq), ref_bq)
    np.testing.assert_allclose(np.asarray(out_d2), ref_d2, rtol=1e-6)


def test_ops_dispatch_skips_small_rows(point_mesh, clouds):
    """Rows below MIN_SHARD_POINTS (the 128-seed kNN regime) stay local."""
    q, r = clouds
    small = q[:, :128]
    with mesh_ctx.use_point_mesh(point_mesh):
        out = point_ops.knn(16, small, r)
        assert len(out.sharding.device_set) == 1
    np.testing.assert_array_equal(np.asarray(out), np.asarray(point_ops.knn(16, small, r)))


@pytest.mark.slow  # ~27 s sharded full-forward trace
def test_point_sharded_model_forward_matches(point_mesh, monkeypatch):
    """End-to-end: the FULL eval forward under a point mesh (the ptt_waymo route:
    SA ball queries + transformer kNN shard implicitly) matches the unsharded
    forward."""
    from ptt_tpu.config import cfg_from_yaml_file
    from ptt_tpu.nn import build_network

    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")
    sa = cfg.MODEL["BACKBONE_3D"]["SA_CONFIG"]
    sa["NPOINTS_SEARCH"] = [256, 64, 32]
    sa["NPOINTS_TEMPLATE"] = [128, 32, 16]
    cfg.MODEL["BOX_HEAD"]["SA_CONFIG"]["NPOINTS"] = 16
    model = build_network(cfg.MODEL)

    rng_ = np.random.default_rng(3)
    batch = {
        "search_points": jnp.asarray(rng_.standard_normal((1, 512, 3)), jnp.float32),
        "template_points": jnp.asarray(rng_.standard_normal((1, 256, 3)), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    ref = np.asarray(model.apply(variables, batch, train=False)["pred_box_data"])

    monkeypatch.setattr(point_ops, "MIN_SHARD_POINTS", 64)  # tiny test shapes
    with mesh_ctx.use_point_mesh(point_mesh):
        out = jax.jit(
            lambda v, b: model.apply(v, b, train=False)["pred_box_data"]
        )(variables, batch)
        out = np.asarray(jax.device_get(out))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_waymo_config_parses_and_enables_sharding():
    from ptt_tpu.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt_waymo.yaml")
    assert cfg.DATA_CONFIG["SEARCH_INPUT_SIZE"] == 8192
    ps = cfg.MODEL["POINT_SHARDING"]
    assert bool(ps["ENABLED"]) and str(ps.get("AXIS", "point")) == "point"
    assert cfg.MODEL["BACKBONE_3D"]["SA_CONFIG"]["NPOINTS_SEARCH"][0] == 2048


def test_ops_dispatch_three_nn(point_mesh, clouds):
    q, r = clouds
    ref_d, ref_i = point_ops.three_nn(q, r)
    with mesh_ctx.use_point_mesh(point_mesh):
        d, i = point_ops.three_nn(q, r)
        assert len(i.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), rtol=1e-6)

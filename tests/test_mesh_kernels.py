"""Fused Pallas kernels under a multi-device mesh (ops/mesh_ctx.py).

Round 3 disabled every fused kernel when len(jax.devices()) > 1; these tests pin
the round-4 fix: with a mesh installed the kernels run inside a shard_map over
the batch axis and match the jnp composite path (interpret mode on the 8-device
virtual CPU platform from conftest.py). The reference has no analog — its CUDA
kernels are single-device by DDP construction (SURVEY.md §2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ptt_tpu.ops import mesh_ctx, pallas_sa, point_ops
from ptt_tpu.ops.pallas_fps import furthest_point_sample_pallas
from ptt_tpu.ops.pallas_group import grouped_first_linear
from ptt_tpu.train.train_state import make_data_mesh


@pytest.fixture
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual CPU devices"
    return make_data_mesh(jax.devices()[:8])


def _sa_inputs(rng, B=8, N=64, M=32, C=8):
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    new_xyz = jnp.asarray(rng.standard_normal((B, M, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    return xyz, new_xyz, feats


def test_fused_sa_matches_jnp_under_mesh(rng, mesh):
    xyz, new_xyz, feats = _sa_inputs(rng)
    ws = (
        jnp.asarray(rng.standard_normal((11, 16)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((16, 16)) * 0.1, jnp.float32),
    )
    bs = (jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32),) * 2

    grouped, _, _ = point_ops.query_and_group(
        0.9, 16, xyz, new_xyz, feats, use_xyz=True, normalize_xyz=True
    )
    h = grouped
    for w, b in zip(ws, bs):
        h = jnp.maximum(h @ w + b, 0.0)
    ref = jnp.max(h, axis=2)

    with mesh_ctx.use_mesh(mesh):
        out = pallas_sa.fused_sa_inference(
            xyz, new_xyz, feats, 0.9, 16, ws, bs, interpret=True
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    # inside jit with batch-sharded inputs: stays sharded end-to-end
    shard = NamedSharding(mesh, P("data"))
    xyz_s = jax.device_put(xyz, shard)
    with mesh_ctx.use_mesh(mesh):
        out_s = jax.jit(
            lambda a: pallas_sa.fused_sa_inference(
                a, new_xyz, feats, 0.9, 16, ws, bs, interpret=True
            )
        )(xyz_s)
    assert len(out_s.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref), atol=2e-4)


def test_grouped_first_linear_value_and_grad_under_mesh(rng, mesh):
    xyz, new_xyz, feats = _sa_inputs(rng)
    w1 = jnp.asarray(rng.standard_normal((11, 16)) * 0.1, jnp.float32)

    def loss(w, use_mesh):
        with mesh_ctx.use_mesh(mesh if use_mesh else None):
            out = grouped_first_linear(xyz, new_xyz, feats, w, 0.9, 16, interpret=True)
        return jnp.sum(out**2), out

    (l0, out0), g0 = jax.value_and_grad(lambda w: loss(w, False), has_aux=True)(w1)
    (l1, out1), g1 = jax.value_and_grad(lambda w: loss(w, True), has_aux=True)(w1)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))  # fwd bit-equal
    # grads differ only by the cross-device reduction order of the dense dW einsum
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-5)
    # the scalar reduces over a sharded array: per-device partial sums change
    # the f32 accumulation order
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)


def test_pallas_fps_under_mesh_bit_exact(rng, mesh):
    xyz = jnp.asarray(rng.standard_normal((8, 128, 3)), jnp.float32)
    ref = point_ops.furthest_point_sample(xyz, 32)
    out = furthest_point_sample_pallas(xyz, 32, interpret=True, mesh=mesh, axis="data")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_indivisible_batch_raises(rng, mesh):
    xyz = jnp.asarray(rng.standard_normal((6, 64, 3)), jnp.float32)  # 6 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        furthest_point_sample_pallas(xyz, 16, interpret=True, mesh=mesh, axis="data")


def test_fused_sa_module_under_sharded_jit(rng, mesh, monkeypatch):
    """Full SA module (the model's fused eval path) under a batch-sharded jit:
    FORCE_INTERPRET turns the fused path on off-TPU; the mesh context makes it
    shard_map. Matches the jnp module path."""
    from ptt_tpu.nn.sa_module import PointnetSAModule

    xyz = jnp.asarray(rng.standard_normal((8, 64, 3)), jnp.float32)
    mod = PointnetSAModule(mlp_channels=[0, 16, 16], radius=0.9, nsample=8)
    variables = mod.init(jax.random.PRNGKey(0), xyz, npoint=16, train=False)

    ref_xyz, ref_feat, ref_inds = mod.apply(variables, xyz, npoint=16, train=False)

    monkeypatch.setattr(pallas_sa, "FORCE_INTERPRET", True)
    shard = NamedSharding(mesh, P("data"))
    xyz_s = jax.device_put(xyz, shard)
    with mesh_ctx.use_mesh(mesh):
        out_xyz, out_feat, out_inds = jax.jit(
            lambda v, x: mod.apply(v, x, npoint=16, train=False)
        )(variables, xyz_s)
    np.testing.assert_array_equal(np.asarray(out_inds), np.asarray(ref_inds))
    np.testing.assert_array_equal(np.asarray(out_xyz), np.asarray(ref_xyz))
    np.testing.assert_allclose(
        np.asarray(out_feat), np.asarray(ref_feat), atol=2e-4, rtol=1e-4
    )


@pytest.mark.slow  # ~65 s grad-graph compile on the virtual mesh
def test_sharded_train_step_with_fused_kernels(rng, mesh, monkeypatch):
    """One sharded train step with the fused grouped-first-linear kernel active
    (FORCE_INTERPRET + mesh): finite loss, replicated params — the multi-chip
    training path the round-3 gate silently lost."""
    import os

    from ptt_tpu.config import cfg_from_yaml_file
    from ptt_tpu.nn import build_network
    from ptt_tpu.train import build_optimizer_and_schedule, create_train_state
    from ptt_tpu.train.train_state import make_sharded_train_step, shard_batch

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = cfg_from_yaml_file(os.path.join(root, "tools/cfgs/kitti_models/ptt.yaml"))
    sa = cfg.MODEL["BACKBONE_3D"]["SA_CONFIG"]
    sa["NPOINTS_SEARCH"] = [128, 64, 32]
    sa["NPOINTS_TEMPLATE"] = [64, 32, 16]
    cfg.MODEL["BOX_HEAD"]["SA_CONFIG"]["NPOINTS"] = 16
    model = build_network(cfg.MODEL)

    batch = {
        "search_points": jnp.asarray(rng.standard_normal((8, 256, 3)), jnp.float32),
        "template_points": jnp.asarray(rng.standard_normal((8, 128, 3)), jnp.float32),
        "cls_label": jnp.asarray(rng.random((8, 256)) > 0.7, jnp.float32),
        "reg_label": jnp.asarray(rng.standard_normal((8, 4)) * 0.3, jnp.float32),
    }
    tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, 1, 1)
    state = create_train_state(model, tx, batch)

    monkeypatch.setattr(pallas_sa, "FORCE_INTERPRET", True)
    step = make_sharded_train_step(cfg.MODEL, mesh)  # scopes the mesh ctx per call
    state, metrics = step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["loss"]))
    assert jax.tree_util.tree_leaves(state.params)[0].sharding.is_fully_replicated
    # the context is scoped to the step call — nothing leaks into later traces
    assert mesh_ctx.get_mesh()[0] is None

"""Pallas TPU kernel tests, run in interpreter mode on the CPU platform so the
kernel logic (not just the jnp fallback) is exercised in CI. On-TPU exactness is
additionally asserted by bench/verify runs (ops/__init__ dispatches to Pallas on
TPU, and the kernel's indices must match the jnp oracle bit-for-bit)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ptt_tpu.ops.pallas_fps import furthest_point_sample_pallas
from ptt_tpu.ops.point_ops import furthest_point_sample


@pytest.mark.parametrize("B,N,m", [(1, 128, 16), (4, 256, 64), (2, 512, 512)])
def test_pallas_fps_matches_jnp(rng, B, N, m):
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    ref = np.asarray(furthest_point_sample(xyz, m))
    got = np.asarray(furthest_point_sample_pallas(xyz, m, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_pallas_fps_duplicate_points(rng):
    """Tie-breaking: duplicated points give equal distances; the first index wins
    (pointnet2 semantics)."""
    base = rng.standard_normal((64, 3)).astype(np.float32)
    xyz = jnp.asarray(np.concatenate([base, base], axis=0)[None])
    ref = np.asarray(furthest_point_sample(xyz, 32))
    got = np.asarray(furthest_point_sample_pallas(xyz, 32, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_pallas_fps_starts_at_zero(rng):
    xyz = jnp.asarray(rng.standard_normal((3, 100, 3)), jnp.float32)
    got = np.asarray(furthest_point_sample_pallas(xyz, 10, interpret=True))
    assert (got[:, 0] == 0).all()

from ptt_tpu.ops.pallas_fps import furthest_point_sample_pair

def test_fused_pair_fps_matches_separate(rng):
    import jax.numpy as jnp
    a = jnp.asarray(rng.standard_normal((3, 256, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((3, 128, 3)), jnp.float32)
    ia, ib = furthest_point_sample_pair(a, 64, b, 32)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(furthest_point_sample(a, 64)))
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(furthest_point_sample(b, 32)))

def test_fused_pair_fps_equal_sizes(rng):
    import jax.numpy as jnp
    a = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    ia, ib = furthest_point_sample_pair(a, 32, b, 32)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(furthest_point_sample(a, 32)))
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(furthest_point_sample(b, 32)))



# ------------------------------------------------------- fused SA inference kernel

from ptt_tpu.ops import pallas_sa, point_ops


def _sa_oracle(xyz, new_xyz, feats, radius, ns, Ws, bs, normalize=True, use_xyz=True):
    g, _, _ = point_ops.query_and_group(
        radius, ns, xyz, new_xyz, feats, use_xyz=use_xyz, normalize_xyz=normalize
    )
    h = g
    for W, b in zip(Ws, bs):
        h = jnp.maximum(jnp.einsum("bmsc,cd->bmsd", h, W) + b, 0.0)
    return jnp.max(h, axis=2)


@pytest.mark.parametrize(
    "B,N,M,ns,C", [(2, 256, 128, 16, 8), (1, 512, 64, 32, 0), (2, 300, 96, 8, 5)]
)
def test_fused_sa_matches_jnp_composite(rng, B, N, M, ns, C):
    """ball-query + group + folded-MLP + max in one kernel == the jnp composite
    (incl. duplicate-pad semantics, relative-xyz normalization, ragged N/M)."""
    radius = 0.4
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :M, :]
    feats = (
        jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32) if C else None
    )
    D = C + 3
    layers = [(D, 16), (16, 32)]
    Ws = [jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32) for s in layers]
    bs = [jnp.asarray(rng.standard_normal((s[1],)) * 0.2, jnp.float32) for s in layers]

    ref = _sa_oracle(xyz, new_xyz, feats, radius, ns, Ws, bs)
    out = pallas_sa.fused_sa_inference(
        xyz, new_xyz, feats, radius, ns, tuple(Ws), tuple(bs), interpret=True
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=2e-5)


def test_fused_sa_empty_ball_pads_point_zero(rng):
    """Centers with no in-radius neighbor must group point 0 (CUDA/ops.ball_query
    zero-init pad semantics)."""
    B, N, M, ns = 1, 128, 64, 8
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)) * 10, jnp.float32)
    far = jnp.asarray(rng.standard_normal((B, M, 3)) + 100.0, jnp.float32)
    Ws = [jnp.asarray(rng.standard_normal((3, 8)) * 0.2, jnp.float32)]
    bs = [jnp.asarray(rng.standard_normal((8,)) * 0.2, jnp.float32)]
    ref = _sa_oracle(xyz, far, None, 0.3, ns, Ws, bs)
    out = pallas_sa.fused_sa_inference(
        xyz, far, None, 0.3, ns, tuple(Ws), tuple(bs), interpret=True
    )
    # rtol matters: far-center outputs reach O(200) magnitude, where f32
    # accumulation-order noise alone is ~2.4e-5 absolute (eps*|x|)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=2e-5)


def test_fused_sa_module_path_matches_jnp_path(rng, monkeypatch):
    """The full PointnetSAModule fused branch (BN folding + kernel) equals the jnp
    SharedMLP branch with the same variables."""
    import jax

    from ptt_tpu.nn.sa_module import PointnetSAModule

    B, N, M, ns, C = 2, 256, 64, 16, 8
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    mod = PointnetSAModule(
        mlp_channels=[C, 16, 32], radius=0.4, nsample=ns, sample_method="fps"
    )
    variables = mod.init(jax.random.PRNGKey(0), xyz, feats, npoint=M, train=False)
    # perturb params and BN stats so folding is non-trivial
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.1 * jnp.asarray(rng.standard_normal(x.shape), x.dtype),
        variables,
    )
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda x: jnp.abs(x) + 0.3, variables["batch_stats"]
    )
    _, ref_feats, ref_inds = mod.apply(variables, xyz, feats, npoint=M, train=False)

    monkeypatch.setattr(pallas_sa, "FORCE_INTERPRET", True)
    _, out_feats, out_inds = mod.apply(variables, xyz, feats, npoint=M, train=False)
    np.testing.assert_array_equal(np.asarray(ref_inds), np.asarray(out_inds))
    np.testing.assert_allclose(
        np.asarray(ref_feats), np.asarray(out_feats), atol=2e-4
    )

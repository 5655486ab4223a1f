"""Fused training group+first-linear kernel (ops/pallas_group.py) vs the jnp
composite (query_and_group -> Dense), forward and GRADIENTS, in the Pallas
interpreter (f32 math, so tolerances are tight)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptt_tpu.ops import point_ops
from ptt_tpu.ops.pallas_group import grouped_first_linear


def composite(xyz, new_xyz, feats, w1, radius, ns, normalize=True, use_xyz=True):
    g, _, _ = point_ops.query_and_group(
        radius, ns, xyz, new_xyz, feats, use_xyz=use_xyz, normalize_xyz=normalize
    )  # (B, M, ns, C[+3])
    return jnp.einsum("bmsc,ch->bmsh", g, w1)  # pre-BN first-layer activations


def to_slot_major(d_bmsh):
    return jnp.transpose(d_bmsh, (0, 2, 1, 3))  # (B, ns, M, H)


def make_case(rng, B, N, M, ns, C, H, spread=1.0):
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)) * spread, jnp.float32)
    new_xyz = xyz[:, :M, :]
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32) if C else None
    D = C + 3
    w1 = jnp.asarray(rng.standard_normal((D, H)) * 0.2, jnp.float32)
    return xyz, new_xyz, feats, w1


@pytest.mark.parametrize("B,N,M,ns,C,H", [(2, 256, 128, 16, 8, 64), (1, 512, 64, 32, 0, 32)])
def test_forward_matches_composite(rng, B, N, M, ns, C, H):
    xyz, new_xyz, feats, w1 = make_case(rng, B, N, M, ns, C, H)
    ref = to_slot_major(composite(xyz, new_xyz, feats, w1, 0.4, ns))
    out = grouped_first_linear(xyz, new_xyz, feats, w1, 0.4, ns, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=2e-5)


def test_forward_empty_ball_pads_point_zero(rng):
    B, N, M, ns, H = 1, 128, 64, 8, 16
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)) * 5, jnp.float32)
    far = jnp.asarray(rng.standard_normal((B, M, 3)) + 60.0, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, H)) * 0.2, jnp.float32)
    ref = to_slot_major(composite(xyz, far, None, w1, 0.3, ns))
    out = grouped_first_linear(xyz, far, None, w1, 0.3, ns, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=2e-4)


@pytest.mark.parametrize("C", [8, 0])
def test_gradients_match_composite(rng, C):
    """d/d(xyz, new_xyz, feats, W1) of a scalar loss must equal the jnp
    composite's autodiff — including the scatter-add-with-duplicates semantics
    for pad rows (centers with < nsample in-radius hits are deliberately
    present via a small radius)."""
    B, N, M, ns, H = 2, 192, 64, 16, 32
    xyz, new_xyz, feats, w1 = make_case(rng, B, N, M, ns, C, H)
    radius = 0.35  # small: many balls have < ns hits -> pad-row gradient paths
    probe = jnp.asarray(rng.standard_normal((B, ns, M, H)), jnp.float32)

    def loss_kernel(xyz, new_xyz, feats, w1):
        out = grouped_first_linear(xyz, new_xyz, feats, w1, radius, ns, interpret=True)
        return jnp.sum(out * probe)

    def loss_ref(xyz, new_xyz, feats, w1):
        out = to_slot_major(composite(xyz, new_xyz, feats, w1, radius, ns))
        return jnp.sum(out * probe)

    args = (xyz, new_xyz, feats, w1)
    argnums = (0, 1, 3) if C == 0 else (0, 1, 2, 3)
    g_kernel = jax.grad(loss_kernel, argnums=argnums)(*args)
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    names = [["xyz", "new_xyz", "w1"], ["xyz", "new_xyz", "feats", "w1"]][C != 0]
    for name, gk, gr in zip(names, g_kernel, g_ref):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=2e-4, atol=2e-4, err_msg=name
        )
    # losses agree too
    np.testing.assert_allclose(
        float(loss_kernel(*args)), float(loss_ref(*args)), rtol=1e-5
    )


def test_module_train_path_matches_jnp(rng, monkeypatch):
    """sa_module's fused TRAIN branch (kernel + flax BN/tail) equals the jnp
    branch: outputs, updated batch_stats, and parameter gradients."""
    from ptt_tpu.nn.sa_module import PointnetSAModule
    from ptt_tpu.ops import pallas_sa

    B, N, M, ns, C = 2, 256, 64, 16, 8
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    mod = PointnetSAModule(
        mlp_channels=[C, 16, 32], radius=0.4, nsample=ns, sample_method="fps"
    )
    variables = mod.init(jax.random.PRNGKey(0), xyz, feats, npoint=M, train=True)

    def run(variables, use_kernel):
        if use_kernel:
            monkeypatch.setattr(pallas_sa, "FORCE_INTERPRET", True)
        else:
            monkeypatch.setattr(pallas_sa, "FORCE_INTERPRET", False)
        def loss_fn(params):
            (new_xyz, out, inds), mut = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xyz, feats, npoint=M, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out**2), (out, inds, mut["batch_stats"])
        (loss, (out, inds, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(variables["params"])
        return loss, out, inds, stats, grads

    loss_r, out_r, inds_r, stats_r, grads_r = run(variables, use_kernel=False)
    loss_k, out_k, inds_k, stats_k, grads_k = run(variables, use_kernel=True)

    np.testing.assert_array_equal(np.asarray(inds_r), np.asarray(inds_k))
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_k), rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        stats_r, stats_k,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        ),
        grads_r, grads_k,
    )

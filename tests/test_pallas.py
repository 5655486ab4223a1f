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


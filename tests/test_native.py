"""Native C++ kernel tests: cross-validate the ctypes library against the jnp ops
(which are themselves oracle-tested in test_ops.py) and the numpy geometry layer.
The three implementations (C++, jnp, numpy geometry) must agree exactly on
sampling indices and crop membership — the C++ library is the CPU-exact oracle for
the pointnet2 kernel semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from ptt_tpu import native
from ptt_tpu.core import geometry as geo
from ptt_tpu.ops import point_ops

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_fps_matches_jnp(rng):
    xyz = rng.standard_normal((4, 200, 3)).astype(np.float32)
    ours = native.fps(xyz, 32)
    jnp_idx = np.asarray(point_ops.furthest_point_sample(jnp.asarray(xyz), 32))
    np.testing.assert_array_equal(ours, jnp_idx)


def test_fps_with_dist_matches_jnp(rng):
    xyz = rng.standard_normal((2, 100, 3)).astype(np.float32)
    d2 = np.sum((xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1).astype(np.float32)
    ours = native.fps_with_dist(d2, 16)
    jnp_idx = np.asarray(point_ops.furthest_point_sample_with_dist(jnp.asarray(d2), 16))
    np.testing.assert_array_equal(ours, jnp_idx)


def test_fps_first_index_is_zero(rng):
    xyz = rng.standard_normal((50, 3)).astype(np.float32)
    assert native.fps(xyz, 5)[0] == 0  # CUDA kernel hardwires idxs[0] = 0


def test_ball_query_matches_jnp(rng):
    xyz = rng.standard_normal((3, 150, 3)).astype(np.float32)
    centers = xyz[:, ::10, :].copy()
    ours = native.ball_query(xyz, centers, radius=0.8, nsample=16)
    jnp_idx = np.asarray(point_ops.ball_query(0.8, 16, jnp.asarray(xyz), jnp.asarray(centers)))
    np.testing.assert_array_equal(ours, jnp_idx)


def test_ball_query_duplicate_pad(rng):
    # a center with exactly 2 in-radius points: slots pad with the first hit
    xyz = np.array([[10, 0, 0], [0.1, 0, 0], [0, 0.1, 0], [20, 0, 0]], np.float32)
    centers = np.zeros((1, 3), np.float32)
    idx = native.ball_query(xyz, centers, radius=0.5, nsample=4)[0]
    np.testing.assert_array_equal(idx, [1, 2, 1, 1])


def test_crop_canonical_matches_geometry(rng):
    box = geo.Box(
        center=rng.uniform(-3, 3, 3),
        wlh=np.array([1.8, 4.2, 1.6]),
        orientation=geo.Quaternion(axis=[0, 0, 1], radians=rng.uniform(-np.pi, np.pi)),
    )
    pts = rng.uniform(-8, 8, (500, 3)).astype(np.float32)
    yaw = np.arctan2(box.rotation_matrix[1, 0], box.rotation_matrix[0, 0])
    box_vec = np.array([*box.center, yaw], np.float32)

    compact, mask = native.crop_canonical(pts, box_vec, box.wlh, offset=0.0, scale=1.25)
    host = geo.crop_center_pc(pts.astype(np.float64), box, offset=0.0, scale=1.25)
    assert compact.shape[0] == host.shape[0]
    a = compact[np.lexsort(compact.T)]
    b = host[np.lexsort(host.T)].astype(np.float32)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_decode_box_matches_geometry(rng):
    for use_z in (False, True):
        box = geo.Box(
            center=rng.uniform(-3, 3, 3),
            wlh=np.array([1.8, 4.2, 1.6]),
            orientation=geo.Quaternion(axis=[0, 0, 1], radians=rng.uniform(-np.pi, np.pi)),
        )
        yaw = np.arctan2(box.rotation_matrix[1, 0], box.rotation_matrix[0, 0])
        box_vec = np.array([*box.center, yaw], np.float32)
        offset4 = np.array([0.3, -0.2, 0.1, 5.0], np.float32)
        out = native.decode_box_offset(box_vec, offset4, use_z)
        host = geo.get_box_by_offset(box, offset4.astype(np.float64), use_z)
        np.testing.assert_allclose(out[:3], host.center, atol=1e-5)
        host_yaw = np.arctan2(host.rotation_matrix[1, 0], host.rotation_matrix[0, 0])
        assert abs((out[3] - host_yaw + np.pi) % (2 * np.pi) - np.pi) < 1e-5


def test_box_iou3d_batch_matches_python(rng):
    """C++ batched IoU/dist vs the python reference-metric implementation."""
    from ptt_tpu.eval.metrics import estimateAccuracy, estimateOverlap

    n = 50
    boxes_a, boxes_b, a7, b7 = [], [], [], []
    for i in range(n):
        wlh = rng.uniform(1, 4, 3)
        ca = rng.uniform(-5, 5, 3)
        # mix: near-overlapping, far, and identical pairs
        cb = ca + (rng.uniform(-1, 1, 3) if i % 3 else np.zeros(3))
        ya, yb = rng.uniform(-np.pi, np.pi, 2)
        if i % 7 == 0:
            cb, yb = ca.copy(), ya
        A = geo.Box(center=ca, wlh=wlh.copy(), orientation=geo.Quaternion(axis=[0, 0, 1], radians=ya))
        B = geo.Box(center=cb, wlh=wlh.copy(), orientation=geo.Quaternion(axis=[0, 0, 1], radians=yb))
        boxes_a.append(A)
        boxes_b.append(B)
        a7.append([*ca, *wlh, ya])
        b7.append([*cb, *wlh, yb])
    a7 = np.asarray(a7, np.float32)
    b7 = np.asarray(b7, np.float32)

    for z_axis in (False, True):
        ious, dists = native.box_iou3d_batch(a7, b7, z_axis=z_axis)
        for i in range(n):
            ref_iou = estimateOverlap(boxes_a[i], boxes_b[i], dim=3, ref_coord="lidar",
                                      z_axis=z_axis)
            ref_dist = estimateAccuracy(boxes_a[i], boxes_b[i], dim=3)
            assert abs(ious[i] - ref_iou) < 2e-4, (i, z_axis, ious[i], ref_iou)
            assert abs(dists[i] - ref_dist) < 1e-4

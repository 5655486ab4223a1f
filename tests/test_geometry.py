"""Geometry-layer tests: quaternion algebra, box corners, canonical-frame crops,
regression-label construction (golden values derived analytically)."""

import numpy as np
import pytest

from ptt_tpu.core.geometry import (
    Box,
    KalmanFiltering,
    Quaternion,
    crop_center_pc,
    crop_pc,
    get_box_by_offset,
    get_model,
    points_in_box_label,
    regularize_pc,
    rotate_points_along_z,
)


def make_box(center=(0, 0, 0), wlh=(2, 4, 1.5), yaw=0.0):
    return Box(np.array(center, float), np.array(wlh, float), Quaternion(axis=[0, 0, 1], angle=yaw))


# ---------------------------------------------------------------------------
# Quaternion
# ---------------------------------------------------------------------------


def test_quaternion_z_rotation_matrix():
    q = Quaternion(axis=[0, 0, 1], angle=np.pi / 2)
    R = q.rotation_matrix
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-12)


def test_quaternion_from_matrix_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        axis = rng.standard_normal(3)
        angle = rng.uniform(-np.pi, np.pi)
        q = Quaternion(axis=axis, angle=angle)
        q2 = Quaternion(matrix=q.rotation_matrix)
        np.testing.assert_allclose(q2.rotation_matrix, q.rotation_matrix, atol=1e-10)


def test_quaternion_mul_compose():
    qa = Quaternion(axis=[0, 0, 1], angle=0.3)
    qb = Quaternion(axis=[0, 0, 1], angle=0.5)
    np.testing.assert_allclose((qa * qb).rotation_matrix,
                               qa.rotation_matrix @ qb.rotation_matrix, atol=1e-12)


def test_quaternion_inverse():
    q = Quaternion(axis=[1, 2, 3], angle=0.7)
    np.testing.assert_allclose((q * q.inverse).rotation_matrix, np.eye(3), atol=1e-12)


# ---------------------------------------------------------------------------
# Box
# ---------------------------------------------------------------------------


def test_box_corners_axis_aligned():
    box = make_box(center=(1, 2, 3), wlh=(2, 4, 6))
    c = box.corners()
    assert c.shape == (3, 8)
    # extents: l/2=2 in x, w/2=1 in y, h/2=3 in z around center
    np.testing.assert_allclose(c[0].max(), 3.0)
    np.testing.assert_allclose(c[0].min(), -1.0)
    np.testing.assert_allclose(c[1].max(), 3.0)
    np.testing.assert_allclose(c[1].min(), 1.0)
    np.testing.assert_allclose(c[2].max(), 6.0)
    np.testing.assert_allclose(c[2].min(), 0.0)


def test_bottom_corners_are_zmin():
    box = make_box(center=(0, 0, 5), wlh=(2, 4, 2), yaw=0.4)
    bc = box.bottom_corners()
    np.testing.assert_allclose(bc[2], np.full(4, 4.0), atol=1e-12)


def test_box_rotate_translate():
    box = make_box(center=(1, 0, 0))
    box.rotate(Quaternion(axis=[0, 0, 1], angle=np.pi / 2))
    np.testing.assert_allclose(box.center, [0, 1, 0], atol=1e-12)


# ---------------------------------------------------------------------------
# Crops
# ---------------------------------------------------------------------------


def test_crop_pc_strict_bounds():
    box = make_box(wlh=(2, 2, 2))
    pts = np.array([[0, 0, 0], [0.99, 0, 0], [1.01, 0, 0], [1.0, 0, 0]])
    out = crop_pc(pts, box)
    # strict inequality: the boundary point at exactly 1.0 is excluded
    assert out.shape[0] == 2


def test_points_in_box_label_rotated():
    box = make_box(center=(5, 5, 0), wlh=(2, 4, 2), yaw=np.pi / 2)
    # box's l=4 now along y; w=2 along x
    pts = np.array([
        [5, 5, 0],        # center: in
        [5, 6.9, 0],      # within l/2=2 along y: in
        [5.95, 5, 0],     # within w/2=1 along x: in
        [6.5, 5, 0],      # outside w/2: out
        [5, 7.5, 0],      # outside l/2: out
    ], float)
    lab = points_in_box_label(pts, box)
    np.testing.assert_array_equal(lab, [1, 1, 1, 0, 0])


def test_crop_center_pc_canonicalizes():
    yaw = 0.6
    box = make_box(center=(10, -3, 1), wlh=(2, 4, 2), yaw=yaw)
    rng = np.random.default_rng(0)
    local = rng.uniform(-0.5, 0.5, size=(50, 3))
    R = Quaternion(axis=[0, 0, 1], angle=yaw).rotation_matrix
    world = local @ R.T + np.array([10, -3, 1])
    out = crop_center_pc(world, box, scale=1.25)
    # all points survive and come back expressed in the box frame
    assert out.shape[0] == 50
    np.testing.assert_allclose(np.sort(out, axis=0), np.sort(local, axis=0), atol=1e-9)


def test_box_encode_decode_roundtrip():
    """16-element flat encoding (reference Box.encode/decode,
    kitti_tracking_utils.py:105-112)."""
    box = make_box(center=(1.0, -2.0, 0.5), wlh=(1.5, 3.5, 1.4), yaw=0.3)
    box.label = 2
    box.score = 0.75
    box.velocity = np.array([0.1, -0.2, 0.0])
    box.name = "Car"
    data = box.encode()
    assert len(data) == 16 and data[15] == "Car"
    back = Box.decode(data)
    assert back == box
    assert back.label == 2 and back.score == 0.75 and back.name == "Car"
    np.testing.assert_allclose(back.velocity, box.velocity)


def test_crop_center_pc_normalize():
    """normalize= divides canonical points axis-wise by (l, w, h) (reference
    PointCloud.normalize, kitti_tracking_utils.py:63-65,337-338)."""
    box = make_box(center=(5, 1, 0), wlh=(2.0, 4.0, 1.5), yaw=0.0)
    rng = np.random.default_rng(1)
    local = rng.uniform(-0.5, 0.5, size=(30, 3))
    world = local + np.array([5, 1, 0])
    plain = crop_center_pc(world, box, scale=1.25)
    normed = crop_center_pc(world, box, scale=1.25, normalize=True)
    np.testing.assert_allclose(normed, plain / np.array([4.0, 2.0, 1.5]), atol=1e-12)


def test_crop_center_pc_train_labels():
    box = make_box(center=(4, 4, 0), wlh=(2, 4, 2))
    gt = make_box(center=(4.5, 4, 0), wlh=(2, 4, 2))
    rng = np.random.default_rng(1)
    pts = np.array([4, 4, 0]) + rng.uniform(-1.5, 1.5, size=(200, 3))
    sample_offsets = np.array([-0.5, 0.0, 2.0])  # theta offset = 2 deg
    out, label, reg = crop_center_pc(
        pts, box, gt_box=gt, sample_offsets=sample_offsets, scale=1.25
    )
    assert out.shape[0] == label.shape[0]
    # reg target: gt center in the sample-box frame = (0.5, 0, 0), theta = -offset
    np.testing.assert_allclose(reg, [0.5, 0, 0, -2.0], atol=1e-9)
    assert 0 < label.sum() < label.shape[0]


def test_get_box_by_offset_is_local_frame():
    yaw = np.pi / 2
    box = make_box(center=(3, 0, 0), wlh=(2, 4, 2), yaw=yaw)
    new_box = get_box_by_offset(box, np.array([1.0, 0.0, 0.0]), use_z=False)
    # +x in the box frame points along world +y after the 90deg yaw
    np.testing.assert_allclose(new_box.center, [3, 1, 0], atol=1e-9)
    # orientation: rotated additionally by offset[-1]=0 degrees -> unchanged
    np.testing.assert_allclose(new_box.orientation.rotation_matrix,
                               box.orientation.rotation_matrix, atol=1e-9)


def test_get_box_by_offset_theta_degrees():
    box = make_box()
    nb = get_box_by_offset(box, np.array([0.0, 0.0, 0.0, 90.0]), use_z=True)
    np.testing.assert_allclose(nb.orientation.rotation_matrix @ np.array([1, 0, 0]),
                               [0, 1, 0], atol=1e-9)


def test_get_model_fuses_frames():
    b1 = make_box(center=(0, 0, 0))
    b2 = make_box(center=(10, 0, 0))
    pts1 = np.array([[0.1, 0, 0], [0.2, 0, 0]])
    pts2 = np.array([[10.1, 0, 0]])
    fused = get_model([pts1, pts2], [b1, b2], scale=1.25)
    assert fused.shape == (3, 3)
    # both frames land in their own canonical frames and overlap near origin
    np.testing.assert_allclose(sorted(fused[:, 0]), [0.1, 0.1, 0.2], atol=1e-9)


# ---------------------------------------------------------------------------
# regularize / sampling
# ---------------------------------------------------------------------------


def test_regularize_pc_shapes(rng):
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    out = regularize_pc(pts, 128, rng=rng)
    assert out.shape == (128, 3)
    out2 = regularize_pc(pts, 512, rng=rng)
    assert out2.shape == (512, 3)


def test_regularize_pc_degenerate_returns_zeros():
    pts = np.zeros((1, 3), dtype=np.float32)
    out = regularize_pc(pts, 16, rng=np.random.default_rng(0))
    assert out.shape == (16, 3)
    np.testing.assert_array_equal(out, 0)


def test_regularize_pc_test_path_deterministic():
    pts = np.random.default_rng(7).standard_normal((99, 3)).astype(np.float32)
    a = regularize_pc(pts, 32, istrain=False)
    b = regularize_pc(pts, 32, istrain=False)
    np.testing.assert_array_equal(a, b)


def test_regularize_with_labels(rng):
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    lab = (np.arange(50) % 2).astype(np.float64)
    out, lab_out, reg = regularize_pc(pts, 20, label=lab, reg=np.arange(4), rng=rng)
    assert out.shape == (20, 3) and lab_out.shape == (20,)
    # labels ride along with their points
    for p, l in zip(out, lab_out):
        i = np.where((pts == p).all(-1))[0][0]
        assert lab[i] == l


def test_kalman_filtering_sample_shape():
    kf = KalmanFiltering(bnd=[1, 1, 5], rng=np.random.default_rng(0))
    s = kf.sample(7)
    assert s.shape == (7, 3)
    kf.addData(np.ones((4, 3)), np.ones(4))
    assert kf.mean.shape == (3,)


def test_rotate_points_along_z():
    pts = np.array([[1.0, 0.0, 0.0, 9.9]])
    out = rotate_points_along_z(pts, np.pi / 2)
    # x => y convention check (angle increases x toward y) and extra channels pass through
    np.testing.assert_allclose(out[0, :3], [0, 1, 0], atol=1e-12)
    assert out[0, 3] == pytest.approx(9.9)

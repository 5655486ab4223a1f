"""Batched box utility tests: corner generation vs the single-Box oracle,
camera<->lidar round trips through a real Calibration, legacy fakelidar
conversions, image projection, and aligned-BEV IoU."""

import numpy as np
import pytest

from ptt_tpu.core import box_utils
from ptt_tpu.core.geometry import Box, Quaternion
from ptt_tpu.data.calibration import Calibration
from tests.test_kitti_data import make_kitti_tree


@pytest.fixture(scope="module")
def calib(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_calib")
    make_kitti_tree(root, n_frames=1)
    return Calibration(root / "training" / "calib" / "0000.txt")


def rand_boxes7(rng, n=10):
    boxes = np.zeros((n, 7))
    boxes[:, 0:3] = rng.uniform(-10, 10, (n, 3))
    boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_boxes_to_corners_matches_box_oracle(rng):
    boxes = rand_boxes7(rng, 5)
    corners = box_utils.boxes_to_corners_3d(boxes)
    for i, b in enumerate(boxes):
        # Box wlh = (w=dy, l=dx, h=dz)
        oracle = Box(b[0:3], [b[4], b[3], b[5]],
                     Quaternion(axis=[0, 0, 1], radians=b[6])).corners().T  # (8, 3)
        got = corners[i]
        a = got[np.lexsort(np.round(got, 6).T)]
        o = oracle[np.lexsort(np.round(oracle, 6).T)]
        np.testing.assert_allclose(a, o, atol=1e-9)


def test_camera_lidar_roundtrip(rng, calib):
    lidar = rand_boxes7(rng, 8)
    cam = box_utils.boxes3d_lidar_to_kitti_camera(lidar, calib)
    back = box_utils.boxes3d_kitti_camera_to_lidar(cam, calib)
    np.testing.assert_allclose(back[:, :6], lidar[:, :6], atol=1e-9)
    dyaw = (back[:, 6] - lidar[:, 6] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dyaw, 0.0, atol=1e-9)


def test_fakelidar_roundtrip(rng):
    lidar = rand_boxes7(rng, 8)
    fake = box_utils.boxes3d_kitti_lidar_to_fakelidar(lidar)
    back = box_utils.boxes3d_kitti_fakelidar_to_lidar(fake)
    np.testing.assert_allclose(back[:, :6], lidar[:, :6], atol=1e-12)
    dyaw = (back[:, 6] - lidar[:, 6] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dyaw, 0.0, atol=1e-12)


def test_enlarge_and_range_mask(rng):
    boxes = rand_boxes7(rng, 6)
    bigger = box_utils.enlarge_box3d(boxes, extra_width=(0.5, 0.5, 0.5))
    np.testing.assert_allclose(bigger[:, 3:6], boxes[:, 3:6] + 1.0)
    mask = box_utils.mask_boxes_outside_range_numpy(
        boxes, np.array([-50, -50, -5, 50, 50, 5])
    )
    assert mask.all()
    mask2 = box_utils.mask_boxes_outside_range_numpy(
        boxes, np.array([100, 100, -5, 101, 101, 5])
    )
    assert not mask2.any()


def test_imageboxes_projection(rng, calib):
    cam = np.array([[0.0, 1.0, 8.0, 4.0, 1.6, 1.8, 0.3]])
    img = box_utils.boxes3d_kitti_camera_to_imageboxes(cam, calib, image_shape=(375, 1242))
    assert img.shape == (1, 4)
    assert (img[:, 2] > img[:, 0]).all() and (img[:, 3] > img[:, 1]).all()
    assert (img >= 0).all() and img[0, 2] <= 1241 and img[0, 3] <= 374


def test_bev_iou(rng):
    boxes = rand_boxes7(rng, 5)
    iou = box_utils.boxes3d_nearest_bev_iou(boxes, boxes)
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-9)
    far = boxes.copy()
    far[:, 0] += 1000
    assert box_utils.boxes3d_nearest_bev_iou(boxes, far).max() == 0.0


def test_in_hull(rng):
    cube = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                     [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]], float)
    pts = np.array([[0.5, 0.5, 0.5], [2, 2, 2], [0.1, 0.9, 0.2]])
    mask = box_utils.in_hull(pts, cube)
    np.testing.assert_array_equal(mask, [True, False, True])

"""Headless visualization smoke tests: figures render and save without a display."""

import numpy as np

from ptt_tpu.core.geometry import Box, Quaternion
from ptt_tpu.utils import visualize


def _box(center, yaw=0.3):
    return Box(center=np.asarray(center, float), wlh=np.array([1.8, 4.2, 1.6]),
               orientation=Quaternion(axis=[0, 0, 1], radians=yaw))


def test_visualize_pts(tmp_path, rng):
    pts = rng.standard_normal((500, 3))
    out = tmp_path / "pts.png"
    visualize.visualize_pts(pts, save_path=out, title="cloud")
    assert out.stat().st_size > 0


def test_draw_scenes_bev_and_3d(tmp_path, rng):
    pts = rng.standard_normal((500, 3)) * 5
    gt, pred = _box([0, 0, 0.8]), _box([0.5, 0.2, 0.8], yaw=0.5)
    p1, p2 = tmp_path / "bev.png", tmp_path / "scene3d.png"
    visualize.draw_scenes(pts, gt_boxes=[gt], pred_boxes=[pred], save_path=p1)
    visualize.draw_scenes_3d(pts, gt_boxes=[gt], pred_boxes=[pred], save_path=p2)
    assert p1.stat().st_size > 0 and p2.stat().st_size > 0


def test_draw_track(tmp_path):
    gt = [_box([t, 0.1 * t, 0.8]) for t in range(10)]
    pred = [_box([t + 0.1, 0.1 * t - 0.05, 0.8]) for t in range(10)]
    out = tmp_path / "track.png"
    visualize.draw_track(gt, pred, save_path=out)
    assert out.stat().st_size > 0

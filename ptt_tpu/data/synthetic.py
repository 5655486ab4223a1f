"""Synthetic tracklet generator: procedurally generated car-like objects on smooth
trajectories with LiDAR-ish surface sampling and ground clutter.

Serves the role the reference has no analog for (it tests only against downloaded
KITTI data): a fully self-contained fixture for end-to-end train/eval smoke tests and
benchmarks.  Geometry is realistic enough that the model must actually localize the
object to reduce the loss: points are sampled on the box faces with occlusion-like
density falloff, plus background clutter inside the search region.
"""

from __future__ import annotations

import numpy as np

from ..core.geometry import Box, Quaternion
from .dataset import TrackingDataset


def _sample_box_surface(rng, box: Box, n: int) -> np.ndarray:
    """Sample ~n points on the visible faces of an oriented box (local frame: x
    forward along length l, y left along width w, z up along height h)."""
    w, l, h = box.wlh
    # allocate points to 4 faces (two sides, back, top) like a lidar sweep would see
    fracs = np.array([0.35, 0.35, 0.15, 0.15])
    counts = (fracs * n).astype(int)
    counts[0] += n - counts.sum()
    pts = []
    # side faces (y = +-w/2)
    for sgn, c in zip((1, -1), counts[:2]):
        x = rng.uniform(-l / 2, l / 2, c)
        z = rng.uniform(-h / 2, h / 2, c)
        y = np.full(c, sgn * w / 2) + rng.normal(0, 0.02, c)
        pts.append(np.stack([x, y, z], axis=1))
    # back face (x = -l/2)
    c = counts[2]
    y = rng.uniform(-w / 2, w / 2, c)
    z = rng.uniform(-h / 2, h / 2, c)
    x = np.full(c, -l / 2) + rng.normal(0, 0.02, c)
    pts.append(np.stack([x, y, z], axis=1))
    # top face (z = h/2)
    c = counts[3]
    x = rng.uniform(-l / 2, l / 2, c)
    y = rng.uniform(-w / 2, w / 2, c)
    z = np.full(c, h / 2) + rng.normal(0, 0.02, c)
    pts.append(np.stack([x, y, z], axis=1))

    local = np.concatenate(pts, axis=0)
    return local @ box.rotation_matrix.T + box.center


class SyntheticTrackingDataset(TrackingDataset):
    """Config keys (all optional): NUM_TRACKLETS, FRAMES_PER_TRACKLET,
    POINTS_PER_FRAME, CLUTTER_POINTS, SYNTH_SEED."""

    def __init__(self, dataset_cfg, class_names="Car", training=True, root_path=None,
                 logger=None, seed=0):
        super().__init__(dataset_cfg, class_names, training, root_path, logger, seed)
        n_trk = int(dataset_cfg.get("NUM_TRACKLETS", 4))
        n_frames = int(dataset_cfg.get("FRAMES_PER_TRACKLET", 12))
        n_pts = int(dataset_cfg.get("POINTS_PER_FRAME", 600))
        n_clutter = int(dataset_cfg.get("CLUTTER_POINTS", 400))
        gen_seed = int(dataset_cfg.get("SYNTH_SEED", 1234))
        # train and test splits generate disjoint tracklets
        if not training:
            gen_seed += 100003

        rng = np.random.default_rng(gen_seed)
        self.tracklets = [
            self._make_tracklet(rng, n_frames, n_pts, n_clutter, tid)
            for tid in range(n_trk)
        ]
        self._finalize()

    def _make_tracklet(self, rng, n_frames, n_pts, n_clutter, tid):
        wlh = np.array([1.8, 4.4, 1.6]) * rng.uniform(0.9, 1.1, 3)
        pos = rng.uniform(-15, 15, 3)
        pos[2] = wlh[2] / 2  # resting on ground
        yaw = rng.uniform(-np.pi, np.pi)
        speed = rng.uniform(0.3, 1.2)
        yaw_rate = rng.uniform(-0.05, 0.05)

        frames = []
        for f in range(n_frames):
            box = Box(pos.copy(), wlh.copy(), Quaternion(axis=[0, 0, 1], angle=yaw))
            obj_pts = _sample_box_surface(rng, box, n_pts)
            # clutter: ground plane + poles in a neighborhood of the object
            cl_xy = box.center[:2] + rng.uniform(-8, 8, (n_clutter, 2))
            cl_z = np.abs(rng.normal(0, 0.05, n_clutter))
            clutter = np.column_stack([cl_xy, cl_z])
            n_pole = n_clutter // 10
            pole_xy = box.center[:2] + rng.uniform(-6, 6, (n_pole, 2))
            poles = np.column_stack(
                [np.repeat(pole_xy, 3, axis=0), rng.uniform(0, 2.5, n_pole * 3)]
            )
            pc = np.concatenate([obj_pts, clutter, poles]).astype(np.float32)
            frames.append({
                "pc": pc,
                "box": box,
                "anno": {"scene": f"synth{tid:02d}", "frame": f, "track_id": tid},
            })
            # advance the trajectory
            heading = np.array([np.cos(yaw), np.sin(yaw), 0.0])
            pos = pos + speed * heading
            yaw = yaw + yaw_rate
        return frames

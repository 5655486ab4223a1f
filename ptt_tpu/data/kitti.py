"""KITTI tracking dataset (reference ptt/datasets/kitti/kitti_dataset_tracking.py:19-360).

Scene splits, label_02 CSV parsing, per-frame velodyne loading with camera/lidar
coordinate handling, a pickle database cache keyed by (class, coord, preload offset),
and the shared train/test item protocol from TrackingDataset.
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path

import numpy as np

from ..core.geometry import Box, Quaternion, crop_pc
from .calibration import Calibration
from .dataset import TrackingDataset

LABEL_COLUMNS = [
    "frame", "track_id", "type", "truncated", "occluded", "alpha",
    "bbox_left", "bbox_top", "bbox_right", "bbox_bottom",
    "height", "width", "length", "x", "y", "z", "rotation_y",
]


def get_scenes(split: str):
    """Scene-id table incl. *_TINY debug splits (reference :254-264)."""
    s = split.upper()
    if "TRAIN" in s:
        return [0] if "TINY" in s else list(range(0, 17))
    if "VAL" in s:
        return [3] if "TINY" in s else list(range(17, 19))
    if "TEST" in s:
        return [0] if "TINY" in s else list(range(19, 21))
    return list(range(21))


class KittiTrackingDataset(TrackingDataset):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None, seed=0):
        super().__init__(dataset_cfg, class_names, training, root_path, logger, seed)
        self.split = dataset_cfg["DATA_SPLIT"][self.mode]
        self.root_path = Path(root_path if root_path is not None else dataset_cfg["DATA_PATH"])
        self.root_split_path = self.root_path / "training"
        self.ref_coor = dataset_cfg.get("REF_COOR", "lidar").upper()
        self.preload_offset = (
            float(dataset_cfg.get("LIDAR_CROP_OFFSET", 10.0)) if self.mode == "train" else -1.0
        )
        self._lidar_cache: dict[tuple, np.ndarray] = {}
        self._calib_cache: dict[str, Calibration] = {}

        self.per_sequence_anno = self._get_tracklet_annos(get_scenes(self.split))
        if bool(dataset_cfg.get("LOAD_FROM_DATABASE", False)):
            self._load_or_build_database()
        else:
            self.tracklets = [
                [self._frame_from_anno(a) for a in trk] for trk in self.per_sequence_anno
            ]
        self._finalize()

    # -- label parsing ------------------------------------------------------
    def _get_tracklet_annos(self, scene_ids):
        import pandas as pd

        lidar_path = self.root_split_path / "velodyne"
        label_path = self.root_split_path / "label_02"
        scenes = sorted(
            p for p in os.listdir(lidar_path)
            if (lidar_path / p).is_dir() and int(p) in scene_ids
        )

        tracklets = []
        for scene in scenes:
            df = pd.read_csv(label_path / f"{scene}.txt", sep=" ", names=LABEL_COLUMNS)
            df = df[df["type"] == self.class_names]
            df.insert(loc=0, column="scene", value=scene)
            for track_id in df.track_id.unique():
                trk = df[df["track_id"] == track_id].sort_values(by=["frame"]).reset_index(drop=True)
                tracklets.append([row.to_dict() for _, row in trk.iterrows()])
        return tracklets

    # -- per-frame data -------------------------------------------------------
    def _get_calib(self, scene) -> Calibration:
        if scene not in self._calib_cache:
            self._calib_cache[scene] = Calibration(self.root_split_path / "calib" / f"{scene}.txt")
        return self._calib_cache[scene]

    def _get_box(self, anno) -> Box:
        wlh = [anno["width"], anno["length"], anno["height"]]
        if self.ref_coor == "LIDAR":
            orientation = Quaternion(axis=[0, 0, 1], radians=anno["rotation_y_lidar"])
            return Box(anno["ctr_in_lidar"], wlh, orientation)
        elif self.ref_coor == "CAMERA":
            orientation = Quaternion(axis=[0, 1, 0], radians=anno["rotation_y"]) * Quaternion(
                axis=[1, 0, 0], radians=np.pi / 2
            )
            return Box(anno["ctr_in_camera"], wlh, orientation)
        raise ValueError("REF_COOR must be CAMERA or LIDAR")

    def _get_lidar(self, anno, box) -> np.ndarray:
        key = (anno["scene"], anno["frame"])
        pc = self._lidar_cache.get(key)
        if pc is None:
            lidar_file = (
                self.root_split_path / "velodyne" / anno["scene"] / f"{int(anno['frame']):06}.bin"
            )
            try:
                pts = np.fromfile(str(lidar_file), dtype=np.float32).reshape(-1, 4)[:, :3]
            except (OSError, ValueError) as e:
                # the reference swallows read failures into a 1-point dummy cloud
                # (kitti_dataset_tracking.py:312); we keep the fallback but log it
                self.logger(f"lidar read failed for {lidar_file}: {e}")
                pts = np.zeros((1, 3), dtype=np.float32)
            if self.ref_coor == "CAMERA":
                calib = self._get_calib(anno["scene"])
                pts = calib.project_velo_to_ref(pts.astype(np.float64))
            self._lidar_cache[key] = pc = pts
        if self.preload_offset > 0:
            pc = crop_pc(pc, box, offset=self.preload_offset)
        return pc

    def _frame_from_anno(self, anno):
        """Reference get_data_from_anno (:344-360): project the rect-camera label
        center into lidar coords, shift up by h/2 to the geometric center."""
        anno = dict(anno)
        calib = self._get_calib(anno["scene"])
        center_rect = np.array([anno["x"], anno["y"], anno["z"]]).reshape(1, 3)
        center_lidar = calib.project_rect_to_velo(center_rect)
        center_lidar[0, 2] += anno["height"] / 2
        anno["ctr_in_camera"] = [anno["x"], anno["y"] - anno["height"] / 2, anno["z"]]
        anno["ctr_in_lidar"] = center_lidar[0].tolist()
        anno["rotation_y_lidar"] = -(np.pi / 2 + anno["rotation_y"])
        box = self._get_box(anno)
        pc = self._get_lidar(anno, box)
        return {"pc": pc, "box": box, "anno": anno}

    # -- pickle DB cache -------------------------------------------------------
    def _db_path(self) -> Path:
        name = self.dataset_cfg["INFO_PATH"][self.mode]
        parts = name.split("_")
        prefix = [str(self.class_names), self.dataset_cfg.get("REF_COOR", "lidar"),
                  str(self.preload_offset)]
        return self.root_path / "_".join([parts[0]] + prefix + parts[1:])

    def _load_or_build_database(self):
        db_path = self._db_path()
        if db_path.exists():
            self.logger(f"loading tracklet database from {db_path}")
            with open(db_path, "rb") as f:
                self.tracklets = pickle.load(f)
        else:
            self.logger(f"generating tracklet database at {db_path}")
            self.tracklets = [
                [self._frame_from_anno(a) for a in trk] for trk in self.per_sequence_anno
            ]
            db_path.parent.mkdir(parents=True, exist_ok=True)
            with open(db_path, "wb") as f:
                pickle.dump(self.tracklets, f)

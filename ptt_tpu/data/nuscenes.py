"""nuScenes tracking dataset (reference ptt/datasets/nuscenes/nus_dataset_tracking.py).

Implemented WITHOUT the nuscenes-devkit dependency: the nuScenes release is a set of
JSON tables (sample, sample_annotation, sample_data, instance, scene, ego_pose,
calibrated_sensor, category); ``NuscenesTables`` loads and indexes the handful the
tracking task needs, and tracklets are chained through annotation ``next`` links per
instance (reference :65-128).

Splits are the standard 700/150/150 scene split with the BAT-style ``train_track``
half-split (reference nus_splits.py:228).
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

import numpy as np

from ..core.geometry import Box, Quaternion, crop_pc
from .dataset import TrackingDataset
from .nuscenes_splits import get_split_scenes, TRACKING_TO_GENERAL_CLASS


class NuscenesTables:
    """Minimal JSON-table loader + token index for a nuScenes version directory."""

    TABLES = (
        "scene",
        "sample",
        "sample_data",
        "sample_annotation",
        "instance",
        "ego_pose",
        "calibrated_sensor",
        "category",
        "log",
    )

    def __init__(self, dataroot: Path, version: str):
        self.dataroot = Path(dataroot)
        table_dir = self.dataroot / version
        if not table_dir.exists():
            raise FileNotFoundError(f"nuScenes tables not found at {table_dir}")
        self._tables = {}
        self._index = {}
        for name in self.TABLES:
            with open(table_dir / f"{name}.json") as f:
                rows = json.load(f)
            self._tables[name] = rows
            self._index[name] = {r["token"]: r for r in rows}

    def get(self, table: str, token: str) -> dict:
        return self._index[table][token]

    def table(self, table: str) -> list:
        return self._tables[table]


def _transform_matrix(translation, rotation_wxyz, inverse=False):
    tm = np.eye(4)
    rot = Quaternion(rotation_wxyz).rotation_matrix
    if inverse:
        tm[:3, :3] = rot.T
        tm[:3, 3] = -rot.T @ np.array(translation)
    else:
        tm[:3, :3] = rot
        tm[:3, 3] = np.array(translation)
    return tm


class NuscenesTrackingDataset(TrackingDataset):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None, seed=0):
        super().__init__(dataset_cfg, class_names, training, root_path, logger, seed)
        self.root_path = Path(root_path if root_path is not None else dataset_cfg["DATA_PATH"])
        self.version = dataset_cfg.get("VERSION", "v1.0-trainval")
        self.split = dataset_cfg["DATA_SPLIT"][self.mode]
        self.key_frame_only = bool(dataset_cfg.get("KEY_FRAME_ONLY", False))
        self.min_points = int(dataset_cfg.get("INIT_POINTS_THRESHOLD", 1))
        self.preload_offset = (
            float(dataset_cfg.get("LIDAR_CROP_OFFSET", 10.0)) if self.mode == "train" else -1.0
        )

        if bool(dataset_cfg.get("LOAD_FROM_DATABASE", False)) and self._db_path().exists():
            self.logger(f"loading tracklet database from {self._db_path()}")
            with open(self._db_path(), "rb") as f:
                self.tracklets = pickle.load(f)
        else:
            self.nusc = NuscenesTables(self.root_path, self.version)
            annos = self._collect_tracklet_annos()
            self.tracklets = [[self._frame_from_anno(a) for a in trk] for trk in annos]
            if bool(dataset_cfg.get("LOAD_FROM_DATABASE", False)):
                self._db_path().parent.mkdir(parents=True, exist_ok=True)
                with open(self._db_path(), "wb") as f:
                    pickle.dump(self.tracklets, f)
        self._finalize()

    def _db_path(self) -> Path:
        name = self.dataset_cfg["INFO_PATH"][self.mode]
        parts = name.split("_")
        prefix = [str(self.class_names), str(self.preload_offset), self.split]
        # tracklet-shaping flags must ride the cache key: a DB pickled with
        # KEY_FRAME_ONLY off would otherwise be silently served when it is on
        if self.key_frame_only:
            prefix.append("kf")
        return self.root_path / "_".join([parts[0]] + prefix + parts[1:])

    # -- tracklet discovery ----------------------------------------------------
    def _collect_tracklet_annos(self):
        scene_names = set(get_split_scenes(self.split))
        general_class = TRACKING_TO_GENERAL_CLASS.get(self.class_names, self.class_names)

        tracklets = []
        for instance in self.nusc.table("instance"):
            category = self.nusc.get("category", instance["category_token"])["name"]
            if general_class not in category:
                continue
            anno_token = instance["first_annotation_token"]
            chain = []
            while anno_token:
                anno = self.nusc.get("sample_annotation", anno_token)
                sample = self.nusc.get("sample", anno["sample_token"])
                scene = self.nusc.get("scene", sample["scene_token"])
                # KEY_FRAME_ONLY drops annotations whose LIDAR_TOP sweep is not a
                # key frame (reference nus_dataset_tracking.py:78). In a standard
                # release this is a no-op — sample['data'] points at the key-frame
                # sweep by construction — but mixed/custom exports can chain
                # non-key sweeps, and the reference filters them.
                if self.key_frame_only and not self.nusc.get(
                    "sample_data", sample["data"]["LIDAR_TOP"]
                ).get("is_key_frame", True):
                    anno_token = anno["next"]
                    continue
                if scene["name"] in scene_names and anno["num_lidar_pts"] >= self.min_points:
                    chain.append(anno)
                anno_token = anno["next"]
            if len(chain) >= 2:
                tracklets.append(chain)
        return tracklets

    # -- frame construction ------------------------------------------------------
    def _frame_from_anno(self, anno):
        sample = self.nusc.get("sample", anno["sample_token"])
        sd = self.nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        pc = self._load_lidar_global(sd)

        box = Box(
            np.array(anno["translation"]),
            # nuScenes size is (w, l, h) already
            np.array(anno["size"]),
            Quaternion(anno["rotation"]),
        )
        if self.preload_offset > 0:
            pc = crop_pc(pc, box, offset=self.preload_offset)
        return {
            "pc": pc.astype(np.float32),
            "box": box,
            "anno": {
                "scene": self.nusc.get("scene", sample["scene_token"])["name"],
                "frame": sample["timestamp"],
                "track_id": anno["instance_token"],
            },
        }

    def _load_lidar_global(self, sample_data) -> np.ndarray:
        """Load a LIDAR_TOP sweep and transform sensor -> ego -> global coords
        (reference nus_dataset_tracking.py:129-156)."""
        fname = self.root_path / sample_data["filename"]
        scan = np.fromfile(str(fname), dtype=np.float32).reshape(-1, 5)[:, :3]
        cs = self.nusc.get("calibrated_sensor", sample_data["calibrated_sensor_token"])
        ego = self.nusc.get("ego_pose", sample_data["ego_pose_token"])
        tm = _transform_matrix(ego["translation"], ego["rotation"]) @ _transform_matrix(
            cs["translation"], cs["rotation"]
        )
        return scan @ tm[:3, :3].T + tm[:3, 3]

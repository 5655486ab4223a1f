"""Tracking dataset base: the train/test item protocol shared by all datasets.

Mirrors the reference's DatasetTemplate + KittiTrackingDataset item construction
(ptt/datasets/tracking_dataset.py:10-69, kitti_dataset_tracking.py:49-179):

  train item: Kalman-sampled box offset -> canonical-frame search crop with per-point
    in-box labels and the 4-dof regression target -> resample to SEARCH_INPUT_SIZE;
    template = first + previous frame crops fused (with small random offset on the
    previous box) -> resample to TEMPLATE_INPUT_SIZE.  Degenerate crops (<= 20 points)
    retry on a random index like the reference (:76,:99).

  test item: the whole tracklet as (list of point clouds, list of boxes, annos).

RNG: a per-item ``np.random.Generator`` seeded from (base_seed, index) — deterministic
and worker-safe, unlike the reference's global-numpy-RNG dependence (a seeding quirk
SURVEY.md section 5 flags as worth not copying).
"""

from __future__ import annotations

import numpy as np

from ..core import geometry as geo
from .augmentor import DataAugmentor
from .encoder import PointFeatureEncoder


class TrackingDataset:
    """Base class. Subclasses populate ``self.tracklets``: a list of tracklets, each a
    list of frame dicts {'pc': (N, 3) float array, 'box': geo.Box, 'anno': dict}."""

    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None, seed=0):
        self.dataset_cfg = dataset_cfg
        self.class_names = class_names
        self.training = training
        self.root_path = root_path
        self.logger = logger.info if logger is not None else (lambda *a: None)
        self.seed = seed

        self.num_candidates_perframe = int(dataset_cfg.get("NUM_CANDIDATES_PERFRAME", 4))
        self.sample_interval = int(dataset_cfg.get("SAMPLED_INTERVAL", 1))
        self.use_z = bool(dataset_cfg.get("USE_Z_AXIS", False))

        pfe_cfg = dataset_cfg.get("POINT_FEATURE_ENCODING")
        self.point_feature_encoder = PointFeatureEncoder(pfe_cfg) if pfe_cfg else None

        aug_cfg = dataset_cfg.get("DATA_AUGMENTOR")
        self.data_augmentor = DataAugmentor(aug_cfg) if (aug_cfg and training) else None

        # opt-in processor queue; the reference configures but never invokes its
        # DataProcessor on tracking items (SURVEY.md §7 quirks) — here it runs
        # when DATA_PROCESSOR is present in the config
        proc_cfg = dataset_cfg.get("DATA_PROCESSOR")
        if proc_cfg:
            from .processor import DataProcessor

            self.data_processor = DataProcessor(proc_cfg, training)
        else:
            self.data_processor = None

        self.tracklets: list[list[dict]] = []
        self._frame_map: list[tuple[int, int]] = []

    # -- to be provided by subclasses ---------------------------------------
    def _build_tracklets(self):
        raise NotImplementedError

    def _finalize(self):
        """Call after self.tracklets is populated."""
        self._frame_map = [
            (t, f) for t, trk in enumerate(self.tracklets) for f in range(len(trk))
        ]

    # -- protocol ------------------------------------------------------------
    @property
    def mode(self):
        return "train" if self.training else "test"

    @property
    def num_frames(self):
        return len(self._frame_map)

    @property
    def num_tracklets(self):
        return len(self.tracklets)

    def __len__(self):
        if self.training:
            return len(self._frame_map) * self.num_candidates_perframe // self.sample_interval
        return len(self.tracklets)

    def grab_data(self, tracklet_id, frame_id):
        return self.tracklets[tracklet_id][frame_id]

    def __getitem__(self, index):
        if self.training:
            index *= self.sample_interval
            rng = np.random.default_rng(np.random.SeedSequence([self.seed, int(index)]))
            item = self.get_train_item(index, rng)
            if self.point_feature_encoder is not None:
                item = self.point_feature_encoder.forward(item)
            if self.data_augmentor is not None:
                item = self.data_augmentor.forward(item, rng=rng)
            if self.data_processor is not None:
                item = self.data_processor.forward(item, rng=rng)
            return item
        return self.get_test_item(index)

    # -- train path ----------------------------------------------------------
    def get_train_item(self, index, rng, _depth=0):
        if _depth > 50:
            raise RuntimeError("too many degenerate samples; dataset looks empty")
        anno_index = index // self.num_candidates_perframe
        aug_index = index % self.num_candidates_perframe

        tracklet_id, frame_id = self._frame_map[anno_index]
        cur = self.grab_data(tracklet_id, frame_id)

        search = self._prepare_search(cur, aug_index, rng)
        if search is None:
            return self.get_train_item(int(rng.integers(0, len(self))), rng, _depth + 1)
        search_pts, cls_label, reg_label = search

        first = self.grab_data(tracklet_id, 0)
        prev = self.grab_data(tracklet_id, max(frame_id - 1, 0))
        template_pts = self._prepare_template([first, prev], aug_index, rng)
        if template_pts is None:
            return self.get_train_item(int(rng.integers(0, len(self))), rng, _depth + 1)

        return {
            "search_points": np.asarray(search_pts, dtype=np.float32),
            "template_points": np.asarray(template_pts, dtype=np.float32),
            "cls_label": np.asarray(cls_label, dtype=np.float32),
            "reg_label": np.asarray(reg_label, dtype=np.float32),
        }

    def _prepare_search(self, frame, aug_index, rng):
        cfg = self.dataset_cfg
        if aug_index == 0:
            offsets = np.zeros(3)
        else:
            offsets = geo.KalmanFiltering(bnd=[1, 1, 5], rng=rng).sample(1)[0]

        sample_box = geo.get_box_by_offset(frame["box"], offsets, self.use_z, rng=rng)
        pts, label, reg = geo.crop_center_pc(
            frame["pc"],
            sample_box,
            gt_box=frame["box"],
            sample_offsets=offsets,
            offset=float(cfg.get("SEARCH_BB_OFFSET", 0.0)),
            scale=float(cfg.get("SEARCH_BB_SCALE", 1.25)),
            refine_box=bool(cfg.get("REFINE_BOX_SIZE", True)),
        )
        if pts.shape[0] <= 20:
            return None
        return geo.regularize_pc(
            pts, int(cfg["SEARCH_INPUT_SIZE"]), label=label, reg=reg, rng=rng
        )

    def _prepare_template(self, frames, aug_index, rng):
        cfg = self.dataset_cfg
        if aug_index == 0:
            offsets = np.zeros(3)
        else:
            offsets = rng.uniform(low=-0.3, high=0.3, size=3)
            offsets[2] = offsets[2] * 5.0

        pcs = [f["pc"] for f in frames]
        boxes = [f["box"] for f in frames]
        boxes[-1] = geo.get_box_by_offset(boxes[-1], offsets, self.use_z, rng=rng)

        template = geo.get_model(
            pcs,
            boxes,
            offset=float(cfg.get("MODEL_BB_OFFSET", 0.0)),
            scale=float(cfg.get("MODEL_BB_SCALE", 1.25)),
        )
        if template.shape[0] <= 20:
            return None
        return geo.regularize_pc(template, int(cfg["TEMPLATE_INPUT_SIZE"]), rng=rng)

    # -- test path -------------------------------------------------------------
    def get_test_item(self, index):
        trk = self.tracklets[index]
        pcs = [f["pc"] for f in trk]
        boxes = [f["box"] for f in trk]
        annos = [f.get("anno", {}) for f in trk]
        return pcs, boxes, annos

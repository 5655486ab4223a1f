"""Config-driven point processor queue (reference
ptt/datasets/processor/data_processor_tracking.py:8-77).

A quirk of the reference deliberately fixed here (SURVEY.md §7 "quirks"): it
instantiates DataProcessor from DATA_CONFIG but never calls its ``forward`` on the
tracking item path (it operates on a ``points`` key the tracking items don't have).
This implementation targets the tracking keys (``search_points`` /
``template_points``) and IS wired into ``TrackingDataset.__getitem__`` when a
``DATA_PROCESSOR`` config list is present — opt-in, off for the shipped configs to
preserve reference behavior.

Processors (same names/config schema as the reference):
  shuffle_points: random permutation, gated by SHUFFLE_ENABLED[mode]
  sample_points:  near/far-aware resample to NUM_POINTS[mode] (points nearer than
                  40 m are subsampled first so sparse far points are kept)
"""

from __future__ import annotations

from functools import partial

import numpy as np

POINT_KEYS = ("search_points", "template_points")


class DataProcessor:
    def __init__(self, processor_configs, training: bool, point_keys=POINT_KEYS):
        self.training = training
        self.mode = "train" if training else "test"
        self.point_keys = point_keys
        self.queue = [
            getattr(self, cfg["NAME"])(config=cfg) for cfg in processor_configs
        ]

    def _map_points(self, data_dict, fn, rng):
        for key in self.point_keys:
            if key in data_dict:
                # keep per-point labels aligned with the search cloud
                label = data_dict.get("cls_label") if key == "search_points" else None
                pts, label = fn(np.asarray(data_dict[key]), label, rng)
                data_dict[key] = pts
                if label is not None:
                    data_dict["cls_label"] = label
        return data_dict

    def shuffle_points(self, data_dict=None, config=None, rng=None):
        if data_dict is None:
            return partial(self.shuffle_points, config=config)
        if not config["SHUFFLE_ENABLED"][self.mode]:
            return data_dict
        rng = rng or np.random.default_rng()

        def _shuffle(pts, label, rng):
            idx = rng.permutation(pts.shape[0])
            return pts[idx], (label[idx] if label is not None else None)

        return self._map_points(data_dict, _shuffle, rng)

    def sample_points(self, data_dict=None, config=None, rng=None):
        if data_dict is None:
            return partial(self.sample_points, config=config)
        num_points = config["NUM_POINTS"][self.mode]
        if num_points == -1:
            return data_dict
        rng = rng or np.random.default_rng()

        def _sample(pts, label, rng):
            n = len(pts)
            if num_points < n:
                depth = np.linalg.norm(pts[:, 0:3], axis=1)
                near = np.where(depth < 40.0)[0]
                far = np.where(depth >= 40.0)[0]
                if num_points > len(far):
                    near_pick = rng.choice(near, num_points - len(far), replace=False)
                    choice = np.concatenate([near_pick, far]) if len(far) else near_pick
                else:
                    choice = rng.choice(np.arange(n), num_points, replace=False)
            else:
                choice = np.arange(n, dtype=np.int64)
                if num_points > n:
                    extra = rng.choice(choice, num_points - n, replace=n < num_points - n)
                    choice = np.concatenate([choice, extra])
            rng.shuffle(choice)
            return pts[choice], (label[choice] if label is not None else None)

        return self._map_points(data_dict, _sample, rng)

    def forward(self, data_dict, rng=None):
        for proc in self.queue:
            data_dict = proc(data_dict=data_dict, rng=rng)
        return data_dict

"""Point feature encoder (reference processor/point_feature_encoder.py:16-50):
selects the used feature channels out of the source channel list for every
``*points*`` key in the data dict."""

from __future__ import annotations

import numpy as np


class PointFeatureEncoder:
    def __init__(self, config):
        self.config = config
        assert list(config["src_feature_list"])[0:3] == ["x", "y", "z"]
        self.used = list(config["used_feature_list"])
        self.src = list(config["src_feature_list"])
        self.num_point_features = len(self.used)

    def forward(self, data_dict):
        encoder = getattr(self, self.config["encoding_type"])
        for key, val in list(data_dict.items()):
            if "points" in key:
                data_dict[key] = encoder(val)
        return data_dict

    def absolute_coordinates_encoding(self, points: np.ndarray) -> np.ndarray:
        if points.shape[-1] == 3 and self.used == ["x", "y", "z"]:
            return points
        idx = [self.src.index(f) for f in self.used]
        return points[:, idx]

"""Official nuScenes scene splits + tracking-class maps.

The split lists are the standard public devkit data (700 train / 150 val / 150 test,
with the detect/track half-split of train the BAT/PTT papers use; reference
ptt/datasets/nuscenes/nus_splits.py).  Stored as a JSON resource next to this module;
this file only loads and exposes them.
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path

_SPLITS_JSON = Path(__file__).parent / "nuscenes_splits.json"


@lru_cache(maxsize=1)
def _load():
    with open(_SPLITS_JSON) as f:
        return json.load(f)


def create_splits_scenes() -> dict:
    """{'train', 'val', 'test', 'mini_train', 'mini_val', 'train_detect',
    'train_track'} -> list of scene names. Verifies the canonical 1000-scene count."""
    splits = dict(_load()["scene_splits"])
    all_scenes = splits["train"] + splits["val"] + splits["test"]
    assert len(all_scenes) == 1000 and len(set(all_scenes)) == 1000, "splits incomplete"
    return splits


def get_split_scenes(split: str) -> list:
    return create_splits_scenes()[split]


def _tracking_to_general() -> dict:
    """tracking class -> the general-category substring used for instance filtering."""
    raw = _load()["tracking_to_general_class"]
    # JSON stores tracking -> [general names]; filtering matches any of them
    return {k: v for k, v in raw.items()}


TRACKING_TO_GENERAL_CLASS = {
    # common aliases used by the shipped configs: match category name substrings
    "car": "vehicle.car",
    "Car": "vehicle.car",
    "truck": "vehicle.truck",
    "bus": "vehicle.bus",
    "trailer": "vehicle.trailer",
    "pedestrian": "human.pedestrian",
    "bicycle": "vehicle.bicycle",
    "motorcycle": "vehicle.motorcycle",
}

"""nuScenes tracking dataset tests against a fabricated on-disk mini release.

Writes the JSON tables (scene/sample/sample_data/sample_annotation/instance/
ego_pose/calibrated_sensor/category/log) plus .bin sweeps for one car tracklet with
exactly-known global-frame geometry, and checks: instance filtering by split +
category + min-lidar-points, tracklet chaining through annotation `next` links, the
sensor->ego->global point transform, and the train/test item protocols."""

import json

import numpy as np
import pytest

from ptt_tpu.core.geometry import Quaternion
from ptt_tpu.data.nuscenes import NuscenesTrackingDataset

CAR_SIZE = [1.9, 4.5, 1.7]  # (w, l, h)
EGO_T = [100.0, 200.0, 0.0]
SENSOR_T = [1.0, 0.0, 1.8]  # lidar mounted forward/up on the ego


def q(axis, rad):
    return list(Quaternion(axis=axis, radians=rad).elements)


def make_nuscenes_tree(root, n_frames=4, rng=None, non_key_frames=()):
    rng = rng or np.random.default_rng(0)
    version = "v1.0-trainval"
    (root / version).mkdir(parents=True)
    (root / "samples" / "LIDAR_TOP").mkdir(parents=True)

    scene_name = "scene-0004"  # in both 'train' and 'train_track'
    tables = {name: [] for name in (
        "scene", "sample", "sample_data", "sample_annotation", "instance",
        "ego_pose", "calibrated_sensor", "category", "log",
    )}
    tables["log"].append({"token": "log0"})
    tables["category"].append({"token": "cat_car", "name": "vehicle.car"})
    tables["category"].append({"token": "cat_ped", "name": "human.pedestrian.adult"})
    tables["calibrated_sensor"].append({
        "token": "cs0", "translation": SENSOR_T, "rotation": q([0, 0, 1], 0.0),
    })
    tables["scene"].append({"token": "scene0", "name": scene_name, "log_token": "log0"})

    centers = []
    anno_tokens = [f"anno{f}" for f in range(n_frames)]
    for f in range(n_frames):
        center = np.array([110.0 + f, 202.0, CAR_SIZE[2] / 2])  # global coords
        centers.append(center)

        tables["ego_pose"].append({
            "token": f"ego{f}", "translation": EGO_T, "rotation": q([0, 0, 1], 0.0),
        })
        fname = f"samples/LIDAR_TOP/sweep{f}.bin"
        tables["sample_data"].append({
            "token": f"sd{f}", "sample_token": f"sample{f}", "filename": fname,
            "ego_pose_token": f"ego{f}", "calibrated_sensor_token": "cs0",
            "is_key_frame": f not in non_key_frames,
        })
        tables["sample"].append({
            "token": f"sample{f}", "scene_token": "scene0", "timestamp": 1000 + f,
            "data": {"LIDAR_TOP": f"sd{f}"},
        })
        tables["sample_annotation"].append({
            "token": anno_tokens[f], "sample_token": f"sample{f}",
            "instance_token": "inst0", "translation": list(center),
            "size": CAR_SIZE, "rotation": q([0, 0, 1], 0.0),
            "num_lidar_pts": 400,
            "prev": anno_tokens[f - 1] if f else "",
            "next": anno_tokens[f + 1] if f + 1 < n_frames else "",
        })

        # points in GLOBAL coords: object cluster + clutter; store in SENSOR frame
        n_obj, n_bg = 400, 600
        w, l, h = CAR_SIZE
        obj = center + rng.uniform([-l / 2, -w / 2, -h / 2], [l / 2, w / 2, h / 2], (n_obj, 3))
        bg = rng.uniform([80, 180, -1], [140, 230, 4], (n_bg, 3))
        pts_global = np.concatenate([obj, bg])
        # global -> ego -> sensor (identity rotations; translations only)
        pts_sensor = pts_global - np.array(EGO_T) - np.array(SENSOR_T)
        scan = np.zeros((pts_sensor.shape[0], 5), np.float32)
        scan[:, :3] = pts_sensor
        scan.tofile(root / fname)

    tables["instance"].append({
        "token": "inst0", "category_token": "cat_car",
        "first_annotation_token": anno_tokens[0], "nbr_annotations": n_frames,
    })
    # a pedestrian instance that must be filtered out for class 'car'
    tables["instance"].append({
        "token": "inst1", "category_token": "cat_ped",
        "first_annotation_token": "", "nbr_annotations": 0,
    })

    for name, rows in tables.items():
        with open(root / version / f"{name}.json", "w") as fjson:
            json.dump(rows, fjson)
    return centers


def base_cfg(root, load_db=False):
    return {
        "DATASET": "NuscenesTrackingDataset",
        "DATA_PATH": str(root),
        "VERSION": "v1.0-trainval",
        "REF_COOR": "lidar",
        "USE_Z_AXIS": True,
        "LOAD_FROM_DATABASE": load_db,
        "LIDAR_CROP_OFFSET": 10.0,
        "INIT_POINTS_THRESHOLD": 1,
        "NUM_CANDIDATES_PERFRAME": 2,
        "SEARCH_INPUT_SIZE": 1024,
        "TEMPLATE_INPUT_SIZE": 512,
        "SEARCH_BB_OFFSET": 0.0,
        "SEARCH_BB_SCALE": 1.25,
        "MODEL_BB_OFFSET": 0.0,
        "MODEL_BB_SCALE": 1.25,
        "REFINE_BOX_SIZE": True,
        "DATA_SPLIT": {"train": "train_track", "test": "val"},
        "SAMPLED_INTERVAL": 1,
        "INFO_PATH": {"train": "nus_infos_train.pkl", "test": "nus_infos_test.pkl"},
    }


@pytest.fixture(scope="module")
def nus_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nuscenes")
    centers = make_nuscenes_tree(root)
    return root, centers


def test_tracklet_chain_and_geometry(nus_root):
    root, centers = nus_root
    ds = NuscenesTrackingDataset(base_cfg(root), "car", training=True)
    assert ds.num_tracklets == 1  # pedestrian instance filtered out
    assert ds.num_frames == 4
    for t, frame in enumerate(ds.tracklets[0]):
        np.testing.assert_allclose(frame["box"].center, centers[t], atol=1e-5)
        np.testing.assert_allclose(frame["box"].wlh, CAR_SIZE, atol=1e-6)
        # sensor->ego->global transform recovered the object cluster near the box
        assert frame["pc"].shape[0] >= 400


def test_split_filtering(nus_root):
    root, _ = nus_root
    cfg = base_cfg(root)
    cfg["DATA_SPLIT"] = {"train": "val", "test": "val"}  # scene-0004 not in val
    ds = NuscenesTrackingDataset(cfg, "car", training=True)
    assert ds.num_tracklets == 0


def test_key_frame_only_filter(tmp_path):
    """KEY_FRAME_ONLY drops annotations chained to non-key-frame lidar sweeps
    (reference nus_dataset_tracking.py:78); off by default, everything stays."""
    make_nuscenes_tree(tmp_path, non_key_frames=(2,))
    cfg = base_cfg(tmp_path)
    ds_all = NuscenesTrackingDataset(cfg, "car", training=True)
    assert ds_all.num_frames == 4
    cfg_kf = dict(cfg, KEY_FRAME_ONLY=True)
    ds_kf = NuscenesTrackingDataset(cfg_kf, "car", training=True)
    assert ds_kf.num_frames == 3
    # the dropped frame is frame 2: the surviving timestamps skip 1002
    stamps = [fr["anno"]["frame"] for fr in ds_kf.tracklets[0]]
    assert stamps == [1000, 1001, 1003]


def test_train_item_and_db_cache(nus_root):
    root, _ = nus_root
    ds = NuscenesTrackingDataset(base_cfg(root, load_db=True), "car", training=True)
    item = ds[0]
    assert item["search_points"].shape == (1024, 3)
    assert item["template_points"].shape == (512, 3)
    np.testing.assert_allclose(item["reg_label"], 0.0, atol=1e-4)
    assert item["cls_label"].sum() > 50
    assert list(root.glob("nus*")), "db cache not written"
    ds2 = NuscenesTrackingDataset(base_cfg(root, load_db=True), "car", training=True)
    assert ds2.num_frames == ds.num_frames

"""KITTI tracking dataset tests against a fabricated on-disk mini dataset.

Builds a 1-scene, 3-frame KITTI tracking tree (velodyne .bin, label_02 CSV, calib)
with a synthetic car whose geometry is known exactly in velodyne coordinates, then
checks label parsing, the rect-camera -> lidar center transform, crop/label
generation, the train/test item protocols, and the pickle database cache."""

import numpy as np
import pytest

from ptt_tpu.data.kitti import KittiTrackingDataset

# velodyne -> camera: cam_x = -velo_y, cam_y = -velo_z, cam_z = velo_x
V2C = np.array([[0.0, -1.0, 0.0, 0.0], [0.0, 0.0, -1.0, 0.0], [1.0, 0.0, 0.0, 0.0]])

CAR = {"h": 1.8, "w": 1.8, "l": 4.2}


def velo_center_to_label_xyz(center_velo, h):
    """Geometric center (velo) -> KITTI label (x, y, z): rect coords of the box
    BOTTOM center (the dataset adds h/2 back in lidar z)."""
    bottom = np.array([center_velo[0], center_velo[1], center_velo[2] - h / 2, 1.0])
    return V2C @ bottom


def make_kitti_tree(root, n_frames=3, rng=None):
    rng = rng or np.random.default_rng(0)
    (root / "training" / "velodyne" / "0000").mkdir(parents=True)
    (root / "training" / "label_02").mkdir(parents=True)
    (root / "training" / "calib").mkdir(parents=True)

    calib_lines = [
        "P0: 700 0 600 0 0 700 180 0 0 0 1 0",
        "P1: 700 0 600 0 0 700 180 0 0 0 1 0",
        "P2: 700 0 600 44 0 700 180 0.1 0 0 1 0.003",
        "P3: 700 0 600 0 0 700 180 0 0 0 1 0",
        "R_rect 1 0 0 0 1 0 0 0 1",
        "Tr_velo_cam " + " ".join(str(v) for v in V2C.reshape(-1)),
        "Tr_imu_velo 1 0 0 0 0 1 0 0 0 0 1 0",
    ]
    (root / "training" / "calib" / "0000.txt").write_text("\n".join(calib_lines))

    label_rows = []
    centers = []
    for f in range(n_frames):
        center = np.array([5.0 + 0.8 * f, 2.0, CAR["h"] / 2])  # moving along +x, on ground
        centers.append(center)
        # object points: dense cluster inside the box + far clutter
        n_obj, n_bg = 400, 800
        obj = center + rng.uniform(
            [-CAR["l"] / 2, -CAR["w"] / 2, -CAR["h"] / 2],
            [CAR["l"] / 2, CAR["w"] / 2, CAR["h"] / 2],
            (n_obj, 3),
        )
        bg = rng.uniform([-30, -30, -2], [30, 30, 3], (n_bg, 3))
        pts = np.concatenate([obj, bg]).astype(np.float32)
        pts4 = np.concatenate([pts, np.ones((pts.shape[0], 1), np.float32)], axis=1)
        pts4.tofile(root / "training" / "velodyne" / "0000" / f"{f:06}.bin")

        lx, ly, lz = velo_center_to_label_xyz(center, CAR["h"])
        # lidar yaw 0 -> rotation_y = -(pi/2) (dataset: yaw_lidar = -(pi/2 + ry))
        label_rows.append(
            f"{f} 1 Car 0 0 0.0 500 150 700 300 "
            f"{CAR['h']} {CAR['w']} {CAR['l']} {lx:.6f} {ly:.6f} {lz:.6f} {-np.pi / 2:.6f}"
        )
    (root / "training" / "label_02" / "0000.txt").write_text("\n".join(label_rows))
    return centers


def base_cfg(tmp_path, load_db=False):
    return {
        "DATASET": "KittiTrackingDataset",
        "DATA_PATH": str(tmp_path),
        "REF_COOR": "lidar",
        "USE_Z_AXIS": True,
        "LOAD_FROM_DATABASE": load_db,
        "LIDAR_CROP_OFFSET": 10.0,
        "NUM_CANDIDATES_PERFRAME": 2,
        "SEARCH_INPUT_SIZE": 1024,
        "TEMPLATE_INPUT_SIZE": 512,
        "SEARCH_BB_OFFSET": 0.0,
        "SEARCH_BB_SCALE": 1.25,
        "MODEL_BB_OFFSET": 0.0,
        "MODEL_BB_SCALE": 1.25,
        "REFINE_BOX_SIZE": True,
        "DATA_SPLIT": {"train": "TRAIN_TINY", "test": "TEST_TINY"},
        "SAMPLED_INTERVAL": 1,
        "INFO_PATH": {"train": "kitti_infos_train.pkl", "test": "kitti_infos_test.pkl"},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
    }


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    centers = make_kitti_tree(root)
    return root, centers


def test_label_parsing_and_box_transform(kitti_root):
    root, centers = kitti_root
    ds = KittiTrackingDataset(base_cfg(root), "Car", training=True)
    assert ds.num_tracklets == 1
    assert ds.num_frames == 3
    for t, frame in enumerate(ds.tracklets[0]):
        box = frame["box"]
        np.testing.assert_allclose(box.center, centers[t], atol=1e-5)
        np.testing.assert_allclose(box.wlh, [CAR["w"], CAR["l"], CAR["h"]], atol=1e-6)
        yaw = np.arctan2(box.rotation_matrix[1, 0], box.rotation_matrix[0, 0])
        assert abs(yaw) < 1e-6  # lidar yaw 0
        # preload crop keeps the object cluster
        assert frame["pc"].shape[0] >= 400


def test_train_item_protocol(kitti_root):
    root, _ = kitti_root
    ds = KittiTrackingDataset(base_cfg(root), "Car", training=True)
    assert len(ds) == 3 * 2  # frames * candidates
    item = ds[0]  # aug_index 0: zero offset
    assert item["search_points"].shape == (1024, 3)
    assert item["template_points"].shape == (512, 3)
    assert item["cls_label"].shape == (1024,)
    assert item["reg_label"].shape == (4,)
    # zero-offset sample: regression target is ~0 (box already centered)
    np.testing.assert_allclose(item["reg_label"], 0.0, atol=1e-5)
    # many in-box points among the 1024 (object has 400 of ~1200 nearby)
    assert item["cls_label"].sum() > 50
    # augmented candidate differs
    item2 = ds[1]
    assert not np.allclose(item2["reg_label"], 0.0, atol=1e-5)


def test_test_item_protocol(kitti_root):
    root, centers = kitti_root
    cfg = base_cfg(root)
    cfg["DATA_SPLIT"] = {"train": "TRAIN_TINY", "test": "TRAIN_TINY"}
    ds = KittiTrackingDataset(cfg, "Car", training=False)
    assert len(ds) == 1  # one tracklet
    pcs, boxes, annos = ds[0]
    assert len(pcs) == len(boxes) == len(annos) == 3
    np.testing.assert_allclose(boxes[1].center, centers[1], atol=1e-5)
    # test mode: full frames, no preload crop
    assert pcs[0].shape[0] == 1200


def test_database_cache_roundtrip(kitti_root):
    root, _ = kitti_root
    ds1 = KittiTrackingDataset(base_cfg(root, load_db=True), "Car", training=True)
    db_files = list(root.glob("kitti*"))
    assert db_files, "database pickle not written"
    ds2 = KittiTrackingDataset(base_cfg(root, load_db=True), "Car", training=True)
    assert ds2.num_frames == ds1.num_frames
    np.testing.assert_allclose(
        ds2.tracklets[0][0]["box"].center, ds1.tracklets[0][0]["box"].center
    )


def test_track3d_label_parser(kitti_root):
    """Per-line label object accessor (reference track3d_kitti.py)."""
    from ptt_tpu.data.kitti_label import Track3d, get_objects_from_label

    root, centers = kitti_root
    objs = get_objects_from_label(root / "training" / "label_02" / "0000.txt")
    assert len(objs) == 3
    o = objs[0]
    assert o.cls_type == "Car" and o.cls_id == 1
    assert o.track_id == "1" and o.frame_id == "0"
    assert (o.h, o.w, o.l) == (CAR["h"], CAR["w"], CAR["l"])
    corners = o.generate_corners3d()
    assert corners.shape == (8, 3)
    # bottom-center parametrization: min corner y == loc y (camera y points down)
    assert abs(corners[:, 1].max() - o.loc[1]) < 1e-6
    # kitti round trip re-parses to the same values
    o2 = Track3d("0 1 " + o.to_kitti_format().split(" ", 1)[0] + " " +
                 o.to_kitti_format().split(" ", 1)[1])
    assert o2.cls_type == o.cls_type and abs(o2.ry - o.ry) < 0.01

"""Data-layer tests on the synthetic tracklet fixture: item protocol, labels,
determinism, loader batching/sharding, and augmentation."""

import numpy as np
import pytest

from ptt_tpu.config import ConfigDict
from ptt_tpu.data import SyntheticTrackingDataset, DataLoader
from ptt_tpu.data.loader import default_collate, identity_collate
from ptt_tpu.data.augmentor import DataAugmentor


def synth_cfg(**over):
    base = dict(
        DATASET="SyntheticTrackingDataset",
        NUM_TRACKLETS=3,
        FRAMES_PER_TRACKLET=6,
        POINTS_PER_FRAME=400,
        CLUTTER_POINTS=200,
        NUM_CANDIDATES_PERFRAME=4,
        SAMPLED_INTERVAL=1,
        SEARCH_INPUT_SIZE=256,
        TEMPLATE_INPUT_SIZE=128,
        SEARCH_BB_OFFSET=0.0,
        SEARCH_BB_SCALE=1.25,
        MODEL_BB_OFFSET=0.0,
        MODEL_BB_SCALE=1.25,
        REFINE_BOX_SIZE=True,
        USE_Z_AXIS=True,
    )
    base.update(over)
    return ConfigDict(base)


@pytest.fixture(scope="module")
def train_ds():
    return SyntheticTrackingDataset(synth_cfg(), class_names="Car", training=True)


def test_train_item_protocol(train_ds):
    assert len(train_ds) == 3 * 6 * 4
    item = train_ds[0]
    assert item["search_points"].shape == (256, 3)
    assert item["template_points"].shape == (128, 3)
    assert item["cls_label"].shape == (256,)
    assert item["reg_label"].shape == (4,)
    assert item["search_points"].dtype == np.float32
    # aug_index 0: zero offset => gt is centered, reg ~ 0
    np.testing.assert_allclose(item["reg_label"], 0.0, atol=1e-6)
    # in-box points exist and are a minority of the search region
    s = item["cls_label"].sum()
    assert 0 < s < 256


def test_train_item_with_offset_has_nonzero_reg(train_ds):
    # aug_index != 0 uses a Kalman-sampled offset; reg label reflects it
    item = train_ds[1]
    assert np.abs(item["reg_label"]).sum() > 0


def test_items_deterministic(train_ds):
    a = train_ds[5]
    b = train_ds[5]
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_test_item_protocol():
    ds = SyntheticTrackingDataset(synth_cfg(), class_names="Car", training=False)
    assert len(ds) == 3
    pcs, boxes, annos = ds[0]
    assert len(pcs) == len(boxes) == len(annos) == 6
    assert pcs[0].ndim == 2 and pcs[0].shape[1] == 3


def test_cls_label_marks_object_points(train_ds):
    item = train_ds[0]
    pts = item["search_points"]
    lab = item["cls_label"].astype(bool)
    # object points (label 1) are near the origin in the canonical frame
    obj_r = np.linalg.norm(pts[lab][:, :2], axis=1)
    assert obj_r.max() < 4.0


def test_loader_batching(train_ds):
    loader = DataLoader(train_ds, batch_size=8, shuffle=True, drop_last=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(train_ds) // 8
    b = batches[0]
    assert b["search_points"].shape == (8, 256, 3)
    assert b["reg_label"].shape == (8, 4)


def test_loader_epoch_shuffling(train_ds):
    loader = DataLoader(train_ds, batch_size=4, shuffle=True, seed=0)
    loader.set_epoch(0)
    o0 = loader._index_order()
    loader.set_epoch(1)
    o1 = loader._index_order()
    assert not np.array_equal(o0, o1)
    loader.set_epoch(0)
    np.testing.assert_array_equal(o0, loader._index_order())


def test_loader_sharding(train_ds):
    full = DataLoader(train_ds, batch_size=8, shuffle=False, drop_last=True)
    s0 = DataLoader(train_ds, batch_size=8, shuffle=False, drop_last=True, num_shards=2, shard_id=0)
    s1 = DataLoader(train_ds, batch_size=8, shuffle=False, drop_last=True, num_shards=2, shard_id=1)
    b, b0, b1 = next(iter(full)), next(iter(s0)), next(iter(s1))
    assert b0["search_points"].shape[0] == 4 and b1["search_points"].shape[0] == 4
    np.testing.assert_array_equal(
        np.concatenate([b0["search_points"], b1["search_points"]]),
        np.concatenate([b["search_points"][0::2], b["search_points"][1::2]]),
    )


def test_identity_collate_for_test():
    ds = SyntheticTrackingDataset(synth_cfg(), class_names="Car", training=False)
    loader = DataLoader(ds, batch_size=1, collate_fn=identity_collate)
    batch = next(iter(loader))
    assert isinstance(batch, list) and len(batch) == 1
    pcs, boxes, annos = batch[0]
    assert len(pcs) == 6


def test_augmentor_flip_consistency():
    rng = np.random.default_rng(0)
    item = {
        "search_points": rng.standard_normal((32, 3)),
        "template_points": rng.standard_normal((16, 3)),
        "cls_label": np.zeros(32),
        "reg_label": np.array([1.0, 2.0, 0.5, 10.0]),
    }
    ref_y = item["search_points"][:, 1].copy()
    aug = DataAugmentor([
        ConfigDict({"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]})
    ], rng=np.random.default_rng(42))
    flipped_any = False
    for _ in range(10):
        trial = {k: v.copy() for k, v in item.items()}
        out = aug.forward(trial)
        if not np.allclose(out["search_points"][:, 1], ref_y):
            flipped_any = True
            np.testing.assert_allclose(out["search_points"][:, 1], -ref_y)
            assert out["reg_label"][1] == -2.0 and out["reg_label"][-1] == -10.0
    assert flipped_any


def test_augmentor_rotation_consistency():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((32, 3))
    item = {
        "search_points": pts.copy(),
        "template_points": rng.standard_normal((16, 3)),
        "cls_label": np.zeros(32),
        "reg_label": np.array([1.0, 0.0, 0.0, 0.0]),
    }
    aug = DataAugmentor(
        [ConfigDict({"NAME": "random_world_rotation", "WORLD_ROT_ANGLE": [0.5, 0.5]})],
        rng=np.random.default_rng(1),
    )
    out = aug.forward(item)
    # norms preserved under rotation; theta channel tracks the rotation in degrees
    np.testing.assert_allclose(
        np.linalg.norm(out["search_points"], axis=1), np.linalg.norm(pts, axis=1), atol=1e-9
    )
    np.testing.assert_allclose(out["reg_label"][-1], np.degrees(0.5), atol=1e-9)

"""Eval-layer tests: polygon IoU vs analytic values, Success/Precision AUC
semantics, the tracking state machine with an oracle model (must score 100/100),
and the full autoregressive loop with the real network on synthetic tracklets."""

import numpy as np
import jax.numpy as jnp
import pytest

from ptt_tpu.config import cfg_from_yaml_file
from ptt_tpu.core.geometry import Box, Quaternion
from ptt_tpu.data.loader import build_dataloader
from ptt_tpu.eval import (
    Precision,
    Success,
    TrackingEvaluator,
    estimateAccuracy,
    estimateOverlap,
    eval_one_epoch,
)
from ptt_tpu.eval.metrics import polygon_area, polygon_intersection_area


def make_box(center, wlh=(2.0, 4.0, 1.5), yaw=0.0):
    return Box(
        center=np.asarray(center, float),
        wlh=np.asarray(wlh, float),
        orientation=Quaternion(axis=[0, 0, 1], radians=yaw),
    )


# ----------------------------------------------------------------- polygon math


def test_polygon_area_square():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    assert polygon_area(sq) == pytest.approx(4.0)
    assert polygon_area(sq[::-1]) == pytest.approx(4.0)  # winding-agnostic


def test_polygon_intersection_shifted_squares():
    a = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    b = a + np.array([1.0, 1.0])
    assert polygon_intersection_area(a, b) == pytest.approx(1.0)
    assert polygon_intersection_area(a, a + 10) == pytest.approx(0.0)


def test_polygon_intersection_rotated():
    # unit square vs itself rotated 45 deg about its center: octagon, area 2(sqrt2-1)
    sq = np.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]])
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rot = sq @ np.array([[c, -s], [s, c]]).T
    expected = 2 * (np.sqrt(2) - 1)
    assert polygon_intersection_area(sq, rot) == pytest.approx(expected, abs=1e-9)


# --------------------------------------------------------------------- box IoU


def test_overlap_identical_box():
    box = make_box([1, 2, 0.75])
    assert estimateOverlap(box, box.copy(), dim=3, ref_coord="lidar") == 1.0


def test_overlap_matches_reference_formula():
    """Shifted boxes: compare against the reference's formula computed by hand
    (vertical extent from center[1] and height — the camera-convention quirk)."""
    wlh = (2.0, 4.0, 1.5)  # w, l, h
    a = make_box([0, 0, 0.75], wlh)
    b = make_box([0.5, 0, 0.75], wlh)  # shifted 0.5 along x (length axis)
    # BEV: l x w footprint 4x2, x-shift 0.5 -> inter 3.5 * 2 = 7
    # vertical (quirk): ymax = min(0, 0) = 0; ymin = max(0-1.5, 0-1.5) = -1.5 -> 1.5
    inter_vol = 7.0 * 1.5
    vol = 2.0 * 4.0 * 1.5
    expected = inter_vol / (2 * vol - inter_vol)
    got = estimateOverlap(a, b, dim=3, ref_coord="lidar")
    assert got == pytest.approx(expected, abs=1e-9)
    # z-correct variant agrees here because both boxes share z
    assert estimateOverlap(a, b, dim=3, ref_coord="lidar", z_axis=True) == pytest.approx(
        expected, abs=1e-9
    )


def test_accuracy_is_center_distance():
    a = make_box([0, 0, 0])
    b = make_box([3, 4, 0])
    assert estimateAccuracy(a, b, dim=3) == pytest.approx(5.0)


# ----------------------------------------------------------------- accumulators


def test_success_auc():
    s = Success()
    for v in [1.0, 1.0]:
        s.add_overlap(v)
    assert s.average == pytest.approx(100.0)
    s.reset()
    s.add_overlap(0.5)
    # indicator curve: 1 for thresholds <= 0.5 (11 of 21 points), trapezoid AUC
    expected = np.trapezoid((np.linspace(0, 1, 21) <= 0.5).astype(float),
                            x=np.linspace(0, 1, 21)) * 100
    assert s.average == pytest.approx(expected)


def test_precision_auc():
    p = Precision()
    p.add_accuracy(0.0)
    assert p.average == pytest.approx(100.0)
    p.reset()
    p.add_accuracy(5.0)  # beyond 2 m -> zero curve
    assert p.average == pytest.approx(0.0)


# ------------------------------------------------------------ tracking machinery


class OracleModel:
    """Predicts zero offset with confidence — with REF_BOX=current_gt the decoded box
    is exactly the GT box, so Success/Precision must be 100/100."""

    def apply(self, variables, batch, train=False):
        B = batch["search_points"].shape[0]
        data = np.zeros((B, 64, 5), np.float32)
        data[:, 0, 4] = 10.0  # best proposal: zero offset, high score
        data[:, 1:, 4] = -10.0
        data[:, 1:, :3] = 5.0  # decoys far away
        return {"pred_box_data": jnp.asarray(data)}


@pytest.fixture(scope="module")
def synth_test_loader():
    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")
    ds_cfg = dict(cfg.DATA_CONFIG)
    ds_cfg.update(DATASET="SyntheticTrackingDataset", NUM_TRACKLETS=2, FRAMES_PER_TRACKLET=6)
    _, loader = build_dataloader(ds_cfg, ["Car"], batch_size=1, training=False)
    return cfg, loader


def test_oracle_tracker_scores_100(synth_test_loader, tmp_path):
    cfg, loader = synth_test_loader
    cfg = cfg.copy()
    cfg.TEST["REF_BOX"] = "current_gt"
    ev = TrackingEvaluator(cfg, OracleModel(), {}, loader.dataset, output_dir=tmp_path)
    for batch in loader:
        for pcs, boxes, annos in batch:
            results = ev.test_tracklet(pcs, boxes, annos)
            assert len(results) == len(pcs)
    s = ev.summary()
    ev.close()
    assert s["success"] == pytest.approx(100.0)
    assert s["precision"] == pytest.approx(100.0)
    # result file has one line per frame with 3 info fields + 24 corner coords
    lines = (tmp_path / "track_result.txt").read_text().strip().splitlines()
    assert len(lines) == s["frames"]
    assert len(lines[0].split()) == 27


@pytest.mark.slow  # ~40 s full tracking loop
def test_full_model_eval_loop(synth_test_loader, tmp_path):
    """Untrained real network through the whole autoregressive eval: metrics finite,
    every frame scored, deterministic across runs (fixed test-path resampling)."""
    import jax
    from ptt_tpu.nn import build_network

    cfg, loader = synth_test_loader
    model = build_network(cfg.MODEL)
    batch = {
        "search_points": jnp.zeros((1, cfg.DATA_CONFIG["SEARCH_INPUT_SIZE"], 3)),
        "template_points": jnp.zeros((1, cfg.DATA_CONFIG["TEMPLATE_INPUT_SIZE"], 3)),
    }
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, train=False))(batch)

    runs = []
    for _ in range(2):
        succ, prec = eval_one_epoch(cfg, model, variables, loader, epoch_id=1,
                                    result_dir=tmp_path)
        runs.append((succ, prec))
    assert np.isfinite(runs[0]).all()
    assert 0 <= runs[0][0] <= 100 and 0 <= runs[0][1] <= 100
    assert runs[0] == runs[1], "test-path eval must be deterministic"

"""Host-vs-device evaluator agreement on a REAL trained network.

The device tracker's documented RNG deviations (device_loop.py header) were pinned
exactly with a constant-offset model (test_device_loop.py); this test pins the
remaining question — how much the deviations move the REPORTED metric with a real
trained network — by briefly training the flagship on the synthetic task and
scoring the same tracklets through both evaluators. The quoted numbers come from
the device path, so |Δ| must stay small.
"""

import jax
import numpy as np
import pytest

from ptt_tpu.config import cfg_from_yaml_file
from ptt_tpu.data.loader import DataLoader, build_dataloader, default_collate
from ptt_tpu.data.synthetic import SyntheticTrackingDataset
from ptt_tpu.eval import TrackingEvaluator
from ptt_tpu.eval.device_loop import DeviceTrackingEvaluator
from ptt_tpu.nn import build_network
from ptt_tpu.train import build_optimizer_and_schedule, create_train_state
from ptt_tpu.train.train_state import make_train_step


@pytest.fixture(scope="module")
def trained_setup():
    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")
    ds_cfg = dict(cfg.DATA_CONFIG)
    ds_cfg.update(
        DATASET="SyntheticTrackingDataset",
        NUM_TRACKLETS=12,
        FRAMES_PER_TRACKLET=8,
        NUM_CANDIDATES_PERFRAME=2,
        SYNTH_SEED=7,
    )
    train_ds = SyntheticTrackingDataset(ds_cfg, ["Car"], training=True)
    loader = DataLoader(
        train_ds, batch_size=8, shuffle=True, drop_last=True,
        collate_fn=default_collate, num_workers=2, seed=0,
    )
    model = build_network(cfg.MODEL)
    epochs = 4
    tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, len(loader), epochs)
    state = create_train_state(model, tx, next(iter(loader)), rng=jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg.MODEL))
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        for batch in loader:
            state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return cfg, model, variables


def test_host_device_metric_agreement_on_trained_model(trained_setup):
    cfg, model, variables = trained_setup
    eval_cfg = dict(cfg.DATA_CONFIG)
    eval_cfg.update(
        DATASET="SyntheticTrackingDataset",
        NUM_TRACKLETS=8,
        FRAMES_PER_TRACKLET=24,
        SYNTH_SEED=11,
    )
    _, test_loader = build_dataloader(eval_cfg, ["Car"], batch_size=1, training=False)
    tracklets = [trk for batch in test_loader for trk in batch]
    n_frames = sum(len(t[0]) for t in tracklets)
    assert n_frames == 192

    host = TrackingEvaluator(cfg, model, variables, test_loader.dataset)
    for trk in tracklets:
        host.test_tracklet(*trk)
    dev = DeviceTrackingEvaluator(cfg, model, variables, max_points=1024, batch_size=8)
    dev.track_batch(tracklets)

    hs, ds = host.summary(), dev.summary()
    print(f"host {hs['success']:.2f}/{hs['precision']:.2f}  "
          f"device {ds['success']:.2f}/{ds['precision']:.2f}")
    assert hs["frames"] == ds["frames"] == n_frames
    # The device loop's RNG streams differ by design (device_loop.py header), so
    # the autoregressive trajectories diverge on sparsely-hit frames; with a
    # 96-step CI-budget model the measured gap is ~0.5-1.5 AUC points over 192
    # frames (it shrinks as the model converges — exact-trajectory agreement is
    # pinned separately by the constant-offset tests in test_device_loop.py).
    assert abs(hs["success"] - ds["success"]) < 2.0, (hs, ds)
    assert abs(hs["precision"] - ds["precision"]) < 2.0, (hs, ds)

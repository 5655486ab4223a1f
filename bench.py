"""Headline benchmark: KITTI-Car-shaped tracking throughput (frames/sec/chip).

Runs the device-resident tracker (ptt_tpu/eval/device_loop.py) on synthetic
KITTI-Car-like tracklets (1024-point search regions, 512-point templates — the
shipped cfgs/kitti_models/ptt.yaml geometry) on the available accelerator, and
reports steady-state frames/sec against the reference's per-frame tracking loop
(~40 fps on an RTX 3090; the TMM 2022 journal's "real-time" claim, live-printed at
eval_tracking_utils.py:108 — no faster number is published in the repo).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}
Diagnostics go to stderr.
"""

import json
import os
import sys
import time

BASELINE_FPS = 40.0  # reference tracking throughput, RTX 3090 (BASELINE.md "Runtime")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    # persistent compilation cache: whole-tracklet scan compiles are expensive and
    # the compile service latency is variable; cache hits make re-runs start fast
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from ptt_tpu.config import cfg_from_yaml_file
    from ptt_tpu.data.loader import build_dataloader
    from ptt_tpu.eval.device_loop import DeviceTrackingEvaluator
    from ptt_tpu.nn import build_network

    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")
    n_tracklets, n_frames, max_points = 8, 64, 2048
    ds_cfg = dict(cfg.DATA_CONFIG)
    ds_cfg.update(
        DATASET="SyntheticTrackingDataset",
        NUM_TRACKLETS=n_tracklets,
        FRAMES_PER_TRACKLET=n_frames,
        POINTS_PER_FRAME=600,
        CLUTTER_POINTS=400,
    )
    _, loader = build_dataloader(ds_cfg, ["Car"], batch_size=1, training=False)
    tracklets = [trk for batch in loader for trk in batch]
    total_frames = sum(len(t[0]) for t in tracklets)

    model = build_network(cfg.MODEL)
    init_batch = {
        "search_points": jnp.zeros((1, int(ds_cfg["SEARCH_INPUT_SIZE"]), 3)),
        "template_points": jnp.zeros((1, int(ds_cfg["TEMPLATE_INPUT_SIZE"]), 3)),
    }
    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, train=False))(init_batch)
    log(f"init+compile: {time.perf_counter() - t0:.1f}s")

    ev = DeviceTrackingEvaluator(
        cfg, model, variables, max_points=max_points, batch_size=n_tracklets
    )
    t0 = time.perf_counter()
    ev.track_batch(tracklets)  # warmup: traces + compiles the whole-tracklet scan
    log(f"tracker compile+first batch: {time.perf_counter() - t0:.1f}s")

    # steady state: pipelined batches (upload+scan of batch k+1 queue behind batch
    # k; host scoring overlaps device execution) — the deployment serving pattern
    fps_runs = []
    n_batches = 4
    for i in range(3):
        t0 = time.perf_counter()
        in_flight = None
        for _ in range(n_batches):
            handle = ev.dispatch_batch(tracklets)
            if in_flight is not None:
                ev.finish_batch(in_flight)
            in_flight = handle
        ev.finish_batch(in_flight)
        dt = time.perf_counter() - t0
        fps_runs.append(n_batches * total_frames / dt)
        log(f"run {i}: {n_batches * total_frames} frames in {dt:.2f}s = {fps_runs[-1]:.1f} fps")

    fps = sorted(fps_runs)[len(fps_runs) // 2]  # median
    print(json.dumps({
        "metric": "kitti_car_tracking_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()

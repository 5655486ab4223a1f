"""Training-side performance measurement (VERDICT round 2, ask #5).

Measures, at the reference schedule's batch size (48, cfgs/kitti_models/
ptt.yaml:124-139) for the standard and ptt_large configs:

  - pure device step time (N same-batch iterations chained through the donated
    state carry, blocked once at the end — the tunnel-attached-TPU-safe method,
    docs/PERFORMANCE.md "Measurement methodology");
  - end-to-end ms/it and samples/s over the real synthetic loader, both
    trainer-style (dispatch-only hot loop, round-2 rework) and with a per-step
    block (the pre-rework behavior) — quantifying the pipelining win;
  - train-step MFU from XLA cost_analysis flops vs the v5e bf16 peak.

Prints a markdown table for docs/PERFORMANCE.md ("Training performance").

Usage: python tools/train_bench.py [--iters 32] [--batch_size 48]
"""

import argparse
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

V5E_BF16_PEAK = 197e12  # flops/s, one chip


def bench_config(cfg_file, batch_size, iters, workers=8, steps_per_dispatch=4):
    import jax

    from ptt_tpu.config import cfg_from_yaml_file
    from ptt_tpu.data.loader import build_dataloader
    from ptt_tpu.nn import build_network
    from ptt_tpu.train import build_optimizer_and_schedule, create_train_state
    from ptt_tpu.train.train_state import (
        make_data_mesh,
        make_sharded_train_step,
        shard_batch,
    )

    cfg = cfg_from_yaml_file(cfg_file)
    ds_cfg = dict(cfg.DATA_CONFIG)
    ds_cfg.update(DATASET="SyntheticTrackingDataset", NUM_TRACKLETS=16,
                  FRAMES_PER_TRACKLET=24)
    _, loader = build_dataloader(ds_cfg, ["Car"], batch_size=batch_size,
                                 training=True, workers=workers)
    model = build_network(cfg.MODEL)
    tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, len(loader), 60)
    batch = next(iter(loader))
    state = create_train_state(model, tx, batch)
    mesh = make_data_mesh()
    step = make_sharded_train_step(cfg.MODEL, mesh)

    sharded = shard_batch(batch, mesh)
    # compile + flops (cost_analysis on the same jitted fn)
    t0 = time.perf_counter()
    lowered = step.lower(state, sharded)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0] if costs else {}
    flops = float(costs.get("flops", -1.0))

    # NOTE: the donated state means `state` is consumed; re-create for timing.
    # The AOT .compile() above does NOT populate the jit call cache, so the first
    # call path still pays a (cached) compile + executable load — warm it up with
    # a few untimed iterations before measuring.
    import numpy as np

    state = create_train_state(model, tx, batch)
    for _ in range(4):
        state, m = step(state, shard_batch(batch, mesh))
    float(np.asarray(jax.device_get(m["loss"])))

    # 1. pure device step: chain N steps through the state carry, block once
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, shard_batch(batch, mesh))
    # materialize to really synchronize (tunnel backends lie to block_until_ready)
    float(np.asarray(jax.device_get(m["loss"])))
    device_ms = (time.perf_counter() - t0) / iters * 1e3

    # 2. end-to-end over the real loader: dispatch-only vs per-step blocking
    def run_epoch(blocking):
        nonlocal state
        n = 0
        t0 = time.perf_counter()
        for b in loader:
            state, mm = step(state, shard_batch(b, mesh))
            if blocking:
                float(np.asarray(jax.device_get(mm["loss"])))
            n += 1
        float(np.asarray(jax.device_get(mm["loss"])))
        return (time.perf_counter() - t0) / n * 1e3

    pipelined_ms = run_epoch(blocking=False)
    blocking_ms = run_epoch(blocking=True)

    # K-step scan per dispatch (OPTIMIZATION.STEPS_PER_DISPATCH): amortizes the
    # fixed dispatch cost — the pipelined-vs-device gap above — over K steps
    multi_k_ms = float("nan")
    if steps_per_dispatch > 1:
        from ptt_tpu.train.train_state import (
            make_sharded_multi_step,
            stack_shard_batches,
        )

        multi = make_sharded_multi_step(cfg.MODEL, mesh, k=steps_per_dispatch)
        group = []
        n = 0
        # warm up one dispatch, then time an epoch of K-dispatches
        for b in loader:
            group.append(b)
            if len(group) == steps_per_dispatch:
                state, mm = multi(state, stack_shard_batches(group, mesh))
                group = []
                break
        float(np.asarray(jax.device_get(mm["loss"])).reshape(-1)[-1])
        t0 = time.perf_counter()
        group = []
        for b in loader:
            group.append(b)
            if len(group) == steps_per_dispatch:
                state, mm = multi(state, stack_shard_batches(group, mesh))
                n += steps_per_dispatch
                group = []
        float(np.asarray(jax.device_get(mm["loss"])).reshape(-1)[-1])
        multi_k_ms = (time.perf_counter() - t0) / max(n, 1) * 1e3

    mfu = flops / (device_ms / 1e3) / V5E_BF16_PEAK if flops > 0 else float("nan")
    return {
        "cfg": Path(cfg_file).stem,
        "batch": batch_size,
        "compile_s": compile_s,
        "device_ms": device_ms,
        "pipelined_ms": pipelined_ms,
        "blocking_ms": blocking_ms,
        "samples_s": batch_size / (pipelined_ms / 1e3),
        "multi_k": steps_per_dispatch,
        "multi_k_ms": multi_k_ms,
        "gflops_per_step": flops / 1e9,
        "mfu_pct": mfu * 100,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=32)
    parser.add_argument("--batch_size", type=int, default=48)
    parser.add_argument("--steps_per_dispatch", type=int, default=4,
                        help="also bench a K-step-scan-per-dispatch epoch (0 = skip)")
    parser.add_argument("--configs", nargs="*", default=[
        "tools/cfgs/kitti_models/ptt.yaml",
        "tools/cfgs/kitti_models/ptt_large.yaml",
    ])
    args = parser.parse_args()

    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rows = [
        bench_config(c, args.batch_size, args.iters,
                     steps_per_dispatch=args.steps_per_dispatch)
        for c in args.configs
    ]

    print("| Config | Batch | Step GFLOP | Device step | E2E ms/it (pipelined) "
          "| E2E ms/it (K-dispatch) | E2E ms/it (blocking) | Samples/s | MFU |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['cfg']} | {r['batch']} | {r['gflops_per_step']:.1f} "
              f"| {r['device_ms']:.1f} ms | {r['pipelined_ms']:.1f} "
              f"| {r['multi_k_ms']:.1f} (K={r['multi_k']}) "
              f"| {r['blocking_ms']:.1f} | {r['samples_s']:.0f} "
              f"| {r['mfu_pct']:.1f}% |")


if __name__ == "__main__":
    main()

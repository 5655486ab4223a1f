"""Demo / smoke CLI (reference tools/demo_tracking.py:42-62): build the loader and
network, print parameter counts and XLA's exact post-fusion FLOPs, run one train
step and one tracking step, and report timings. Defaults to the synthetic dataset so
it runs with no data downloads."""

import argparse
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from ptt_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, default="tools/cfgs/kitti_models/ptt.yaml")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--real_data", action="store_true",
                        help="use the dataset from the config instead of synthetic")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from ptt_tpu.utils import apply_platform_env

    apply_platform_env()

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)

    import jax
    import jax.numpy as jnp

    from ptt_tpu.data.loader import build_dataloader
    from ptt_tpu.nn import build_network, compute_losses
    from ptt_tpu.train import build_optimizer_and_schedule, create_train_state
    from ptt_tpu.train.train_state import make_train_step
    from ptt_tpu.utils.profiling import (
        cost_analysis,
        count_parameters,
        format_cost_table,
        format_layer_table,
        per_layer_flops,
        per_module_cost_analysis,
    )

    print(f"devices: {jax.devices()}")

    ds_cfg = dict(cfg.DATA_CONFIG)
    if not args.real_data:
        ds_cfg.update(DATASET="SyntheticTrackingDataset", NUM_TRACKLETS=2, FRAMES_PER_TRACKLET=8)
    dataset, loader = build_dataloader(ds_cfg, cfg.CLASS_NAMES, args.batch_size, training=True)
    print(f"dataset: {len(dataset)} samples")
    batch = next(iter(loader))

    model = build_network(cfg.MODEL)
    tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, len(loader), 1)
    t0 = time.perf_counter()
    state = create_train_state(model, tx, batch)
    print(f"init: {time.perf_counter() - t0:.1f}s")

    counts = count_parameters(state.params)
    print(f"parameters: {counts['total']:,}")
    for name, n in counts["per_module"].items():
        print(f"  {name:<24} {n:>10,}")

    fwd = lambda v, b: model.apply(v, b, train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_batch = {k: batch[k] for k in ("search_points", "template_points")}
    costs = cost_analysis(fwd, variables, eval_batch)
    print(f"forward (batch {args.batch_size}): {costs['flops'] / 1e9:.2f} GFLOP, "
          f"{costs['bytes_accessed'] / 1e6:.1f} MB accessed (XLA post-fusion)")

    # per-module breakdown (reference calc_flops table, tracker3d_template.py:158-267)
    rows = per_module_cost_analysis(cfg.MODEL, variables, eval_batch)
    print(format_cost_table(rows))

    # per-layer walk (the reference's hook-based table granularity)
    print(format_layer_table(per_layer_flops(model, variables, eval_batch)))

    train_step = jax.jit(make_train_step(cfg.MODEL))
    t0 = time.perf_counter()
    state, metrics = train_step(state, batch)
    metrics = jax.device_get(metrics)
    print(f"one train step: {time.perf_counter() - t0:.1f}s (incl. compile), "
          f"loss {float(metrics['loss']):.4f}")
    t0 = time.perf_counter()
    state, metrics = jax.block_until_ready(train_step(state, batch))
    print(f"steady train step: {(time.perf_counter() - t0) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()

"""Pre-compile the canonical executables into the persistent compilation cache.

The whole-tracklet tracking scan costs minutes to compile cold through the remote
compile service (BENCH_r02: 993 s); this tool compiles the hot programs once so
every later run — bench.py, the eval CLI, training — starts warm:

  - the batched device-tracker scan at the bench shapes (B=8, T=64, N=2048);
  - the single-chip eval forward (B=1) used by the host evaluator;
  - (--train) the jitted train step at the reference batch size.

With ``--seed-out cache_seeds`` the freshly compiled executables are copied into
the committed cache_seeds/ directory, which bench.py re-seeds .jax_cache from on
a fresh machine — the shipped-warm-path mitigation for cold starts. Regenerate
the seeds (rerun this tool) after editing any file on the trace path: the cache
key covers the traced program, including source locations.

Usage:
  python tools/warmup.py [--train] [--seed-out cache_seeds]
"""

import argparse
import os
import shutil
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train", action="store_true",
                        help="also compile the train step (reference batch 48)")
    parser.add_argument("--batch_size", type=int, default=48)
    parser.add_argument("--seed-out", type=str, default=None,
                        help="copy the cache entries into this committed dir")
    args = parser.parse_args()

    import bench

    bench.check_tpu_reachable()
    cache_dir = bench.setup_cache()
    before = set(os.listdir(cache_dir))

    import jax

    from ptt_tpu.eval.device_loop import DeviceTrackingEvaluator
    from ptt_tpu.eval.evaluator import make_track_step

    cfg, model, variables, tracklets, max_points = bench.build_bench_setup()

    # 1. the batched whole-tracklet scan at the bench shapes
    t0 = time.perf_counter()
    ev = DeviceTrackingEvaluator(
        cfg, model, variables, max_points=max_points, batch_size=len(tracklets)
    )
    ev.track_batch(tracklets)
    print(f"tracker scan compile: {time.perf_counter() - t0:.1f}s")

    # 2. the B=1 eval forward (host evaluator / latency mode)
    import jax.numpy as jnp

    t0 = time.perf_counter()
    step = make_track_step(model)
    out = step(
        variables,
        jnp.zeros((1, int(cfg.DATA_CONFIG["SEARCH_INPUT_SIZE"]), 3)),
        jnp.zeros((1, int(cfg.DATA_CONFIG["TEMPLATE_INPUT_SIZE"]), 3)),
    )
    jax.block_until_ready(out)
    print(f"B=1 forward compile: {time.perf_counter() - t0:.1f}s")

    # 3. optionally the train step
    if args.train:
        from ptt_tpu.data.loader import build_dataloader
        from ptt_tpu.train import build_optimizer_and_schedule, create_train_state
        from ptt_tpu.train.train_state import (
            make_data_mesh,
            make_sharded_train_step,
            shard_batch,
        )

        ds_cfg = dict(cfg.DATA_CONFIG)
        ds_cfg.update(DATASET="SyntheticTrackingDataset", NUM_TRACKLETS=4,
                      FRAMES_PER_TRACKLET=12)
        _, train_loader = build_dataloader(
            ds_cfg, ["Car"], batch_size=args.batch_size, training=True
        )
        batch = next(iter(train_loader))
        tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, len(train_loader), 1)
        state = create_train_state(model, tx, batch)
        mesh = make_data_mesh()
        train_step = make_sharded_train_step(cfg.MODEL, mesh)
        t0 = time.perf_counter()
        state, metrics = train_step(state, shard_batch(batch, mesh))
        jax.block_until_ready(metrics["loss"])
        print(f"train step compile (batch {args.batch_size}): "
              f"{time.perf_counter() - t0:.1f}s")

    if args.seed_out:
        # The persistent-cache key is entry-point-process-sensitive (a tracker
        # executable compiled from this process does NOT hit for a `python
        # bench.py` process — observed empirically; bench-to-bench hits are
        # reliable). So compile the bench's own tracker entry by actually
        # running bench.py as a subprocess against the same cache dir before
        # copying the seeds.
        import subprocess
        import sys as _sys

        print("running bench.py once to write its own-keyed executables ...")
        proc = subprocess.run(
            [_sys.executable, str(REPO_ROOT / "bench.py")],
            cwd=REPO_ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        tail = "\n".join(proc.stdout.splitlines()[-4:])
        print(f"bench rc={proc.returncode}\n{tail}")

        seed_dir = REPO_ROOT / args.seed_out
        seed_dir.mkdir(parents=True, exist_ok=True)
        copied = 0
        for name in os.listdir(cache_dir):
            src = os.path.join(cache_dir, name)
            dst = seed_dir / name
            if os.path.isfile(src) and (name not in before or not dst.exists()):
                shutil.copy2(src, dst)
                copied += 1
        total_mb = sum(f.stat().st_size for f in seed_dir.iterdir()) / 1e6
        print(f"copied {copied} cache entries to {seed_dir} ({total_mb:.1f} MB total)")


if __name__ == "__main__":
    main()

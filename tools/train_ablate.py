"""Roofline decomposition of the train step (VERDICT round-4 item 3).

The fused grouped-first-linear kernel already covers every SA stage (backbone
x6 + box-head vote aggregation), so the remaining question is WHAT bounds the
step now. This tool measures, at the reference batch size (48, the schedule at
/root/reference/tools/cfgs/kitti_models/ptt.yaml:124-139):

  - pure device step time per variant, on the tunnel-safe method (chain the
    donated state carry, materialize once — docs/PERFORMANCE.md "Measurement
    methodology"):
      * f32 vs bf16 (OPTIMIZATION.MIXED_PRECISION — bf16 is the trainer's
        production default since round 4);
      * fused grouped_first_linear vs the jnp group path (pallas_sa
        DISABLE_FUSED, same switch as tools/fused_ab.py);
      * forward-only (loss, no grad/update) at both precisions — splits the
        step into fwd vs bwd+optim by subtraction;
  - per-variant FLOPs and HBM bytes from the compiled program's
    cost_analysis, and from them the two roofline floors on one v5e chip:
      * compute floor = flops / 197e12 (bf16 MXU peak)
      * bandwidth floor = bytes / 819e9 (HBM peak)
    plus the achieved fraction of whichever floor binds. A step whose achieved
    HBM bandwidth sits near peak is bandwidth-bound at speed-of-light — no
    kernel work can improve it without removing bytes (e.g. BatchNorm's global
    batch statistics forcing the grouped activations through HBM, which is a
    semantics constraint, not a lowering artifact).

Usage: python tools/train_ablate.py [--iters 24] [--batch_size 48]
       [--cfg_file tools/cfgs/kitti_models/ptt.yaml]
"""

import argparse
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

V5E_BF16_PEAK = 197e12  # flops/s, one chip
V5E_HBM_BPS = 819e9     # bytes/s, one chip


def _cost(compiled):
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0] if costs else {}
    return float(costs.get("flops", -1.0)), float(costs.get("bytes accessed", -1.0))


def measure_step(cfg, loader, batch, mixed_precision, fused, iters):
    """Pure device step ms for one (precision, fused) variant."""
    import numpy as np
    import jax

    from ptt_tpu.nn import build_network
    from ptt_tpu.ops import pallas_sa
    from ptt_tpu.train import build_optimizer_and_schedule, create_train_state
    from ptt_tpu.train.train_state import (
        make_data_mesh,
        make_sharded_train_step,
        shard_batch,
    )

    prev = pallas_sa.DISABLE_FUSED
    pallas_sa.DISABLE_FUSED = not fused
    try:
        model = build_network(cfg.MODEL)
        tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, len(loader), 60)
        state = create_train_state(model, tx, batch)
        mesh = make_data_mesh()
        step = make_sharded_train_step(cfg.MODEL, mesh,
                                       mixed_precision=mixed_precision)
        sharded = shard_batch(batch, mesh)
        flops, hbm_bytes = _cost(step.lower(state, sharded).compile())

        for _ in range(4):  # warm up past compile + executable load
            state, m = step(state, shard_batch(batch, mesh))
        float(np.asarray(jax.device_get(m["loss"])))

        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, shard_batch(batch, mesh))
        float(np.asarray(jax.device_get(m["loss"])))
        ms = (time.perf_counter() - t0) / iters * 1e3
        return ms, flops, hbm_bytes
    finally:
        pallas_sa.DISABLE_FUSED = prev


def measure_fwd_only(cfg, loader, batch, mixed_precision, iters):
    """Forward + loss only (no grad, no update), production fused path.

    No state is mutated, so instead of a carry chain we issue ``iters``
    dispatches and materialize the last loss: the device executes dispatches
    in order, so the elapsed wall covers all of them (same property the
    trainer's pipelined loop relies on).
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ptt_tpu.nn import build_network
    from ptt_tpu.nn.losses import compute_losses
    from ptt_tpu.ops import mesh_ctx
    from ptt_tpu.train import build_optimizer_and_schedule, create_train_state
    from ptt_tpu.train.train_state import (
        _cast_floats,
        make_data_mesh,
        shard_batch,
    )

    model = build_network(cfg.MODEL)
    tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, len(loader), 60)
    state = create_train_state(model, tx, batch)
    mesh = make_data_mesh()

    def fwd(params, batch_stats, b):
        if mixed_precision:
            params = _cast_floats(params, jnp.bfloat16)
            b_apply = _cast_floats(b, jnp.bfloat16)
        else:
            b_apply = b
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            b_apply, train=True, mutable=["batch_stats"],
        )
        if mixed_precision:
            out = _cast_floats(out, jnp.float32)
        loss, _ = compute_losses(cfg.MODEL, out, b)
        return loss

    repl = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("data"))
    jitted = jax.jit(fwd, in_shardings=(repl, repl, shd), out_shardings=repl)
    sharded = shard_batch(batch, mesh)

    with mesh_ctx.use_mesh(mesh, "data"):
        flops, hbm_bytes = _cost(
            jitted.lower(state.params, state.batch_stats, sharded).compile()
        )
        for _ in range(4):
            loss = jitted(state.params, state.batch_stats, sharded)
        float(np.asarray(jax.device_get(loss)))
        t0 = time.perf_counter()
        for _ in range(iters):
            loss = jitted(state.params, state.batch_stats, sharded)
        float(np.asarray(jax.device_get(loss)))
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, flops, hbm_bytes


def roofline_row(name, ms, flops, hbm_bytes):
    s = ms / 1e3
    flop_floor = flops / V5E_BF16_PEAK * 1e3 if flops > 0 else float("nan")
    bw_floor = hbm_bytes / V5E_HBM_BPS * 1e3 if hbm_bytes > 0 else float("nan")
    binding = "HBM" if bw_floor >= flop_floor else "MXU"
    floor = max(flop_floor, bw_floor)
    achieved_pct = floor / ms * 100 if ms > 0 else float("nan")
    gbps = hbm_bytes / s / 1e9 if hbm_bytes > 0 else float("nan")
    return (f"| {name} | {ms:.1f} | {flops / 1e9:.0f} | {hbm_bytes / 1e9:.2f} "
            f"| {flop_floor:.1f} | {bw_floor:.1f} | {binding} "
            f"| {achieved_pct:.0f}% | {gbps:.0f} |")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=24)
    parser.add_argument("--batch_size", type=int, default=48)
    parser.add_argument("--cfg_file", default="tools/cfgs/kitti_models/ptt.yaml")
    args = parser.parse_args()

    import jax

    import bench
    from ptt_tpu.config import cfg_from_yaml_file
    from ptt_tpu.data.loader import build_dataloader

    bench.setup_cache()  # seed the persistent cache: the f32 fused step is shipped
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = cfg_from_yaml_file(args.cfg_file)
    ds_cfg = dict(cfg.DATA_CONFIG)
    ds_cfg.update(DATASET="SyntheticTrackingDataset", NUM_TRACKLETS=16,
                  FRAMES_PER_TRACKLET=24)
    _, loader = build_dataloader(ds_cfg, ["Car"], batch_size=args.batch_size,
                                 training=True, workers=4)
    batch = next(iter(loader))

    rows = []
    for name, mp, fused in [
        ("full step, f32, fused", False, True),
        ("full step, bf16, fused (trainer default)", True, True),
        ("full step, f32, jnp group path", False, False),
        ("full step, bf16, jnp group path", True, False),
    ]:
        print(f"  [{time.strftime('%H:%M:%S')}] start {name}", file=sys.stderr,
              flush=True)
        ms, fl, by = measure_step(cfg, loader, batch, mp, fused, args.iters)
        rows.append((name, ms, fl, by))
        print(f"  measured {name}: {ms:.1f} ms", file=sys.stderr, flush=True)
    for name, mp in [("fwd-only, f32, fused", False),
                     ("fwd-only, bf16, fused", True)]:
        print(f"  [{time.strftime('%H:%M:%S')}] start {name}", file=sys.stderr,
              flush=True)
        ms, fl, by = measure_fwd_only(cfg, loader, batch, mp, args.iters)
        rows.append((name, ms, fl, by))
        print(f"  measured {name}: {ms:.1f} ms", file=sys.stderr, flush=True)

    print("\n| Variant | Device ms | GFLOP | HBM GB | MXU floor ms | HBM floor ms "
          "| binds | % of roofline | achieved GB/s |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(roofline_row(*r))

    by_name = {r[0]: r for r in rows}
    f32 = by_name["full step, f32, fused"]
    bf16 = by_name["full step, bf16, fused (trainer default)"]
    ff32 = by_name["fwd-only, f32, fused"]
    fb16 = by_name["fwd-only, bf16, fused"]
    print(f"\nbwd+optim by subtraction: f32 {f32[1] - ff32[1]:.1f} ms, "
          f"bf16 {bf16[1] - fb16[1]:.1f} ms")
    print("(floors: MXU = flops/197e12, HBM = bytes/819e9, one v5e chip; "
          "'% of roofline' = binding floor / measured)")


if __name__ == "__main__":
    main()

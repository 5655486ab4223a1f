"""Worker for the real multi-process distributed test (run as a subprocess).

Each process owns 2 virtual CPU devices; together they form a 4-device global
mesh. Exercises the branches that are dead in single-process runs:
``shard_batch``'s ``make_array_from_process_local_data`` path and
``merge_metric_lists``'s ``process_allgather`` path (the reference's analog —
common_utils.py:248-330 — was never runnable without a cluster; SURVEY.md §4).

Usage: python tests/_dist_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys

LOCAL_DEVICES = 2


def main():
    coordinator, num_processes, process_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ptt_tpu.utils.dist import get_dist_info, init_distributed, merge_metric_lists

    rank, world = init_distributed(coordinator, num_processes, process_id)
    assert (rank, world) == (process_id, num_processes), (rank, world)
    assert get_dist_info() == (process_id, num_processes)
    n_global = len(jax.devices())
    assert n_global == num_processes * LOCAL_DEVICES, f"global devices {n_global}"

    import numpy as np

    from __graft_entry__ import _build_model_and_batch
    from ptt_tpu.train import build_optimizer_and_schedule, create_train_state
    from ptt_tpu.train.train_state import (
        make_data_mesh,
        make_sharded_train_step,
        shard_batch,
    )

    # Per-process LOCAL slice of the global batch (loader shard semantics): the
    # global batch is n_global items, each process materializes its own
    # LOCAL_DEVICES-sized piece, deterministically derived from the rank.
    cfg, model, local_batch = _build_model_and_batch(
        search_n=256, template_n=128, batch=LOCAL_DEVICES,
        npoints=([128, 64, 32], [64, 32, 16]),
    )
    local_batch = {
        k: np.asarray(v) + 0.01 * process_id for k, v in local_batch.items()
    }
    local_batch["cls_label"] = (local_batch["cls_label"] > 0.5).astype(np.float32)

    mesh = make_data_mesh(jax.devices())
    tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, iters_per_epoch=1, total_epochs=1)
    state = create_train_state(model, tx, local_batch)
    step = make_sharded_train_step(cfg.MODEL, mesh)

    for _ in range(2):
        sharded = shard_batch(local_batch, mesh)
        assert len(sharded["search_points"].sharding.device_set) == n_global
        assert sharded["search_points"].shape[0] == n_global  # global batch dim
        state, metrics = step(state, sharded)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    assert np.isfinite(loss), loss

    # Params must be identical on every process (the all-reduce actually ran over
    # both processes' gradients).
    leaves = jax.tree_util.tree_leaves(state.params)
    param_sum = float(sum(np.abs(np.asarray(jax.device_get(x))).sum() for x in leaves))
    merged = merge_metric_lists([param_sum, float(rank)])
    assert merged.shape == (2 * world,), merged.shape
    sums = sorted(merged)[world:]  # rank values 0..world-1 sort below the sums
    assert all(abs(s - sums[0]) < 1e-6 * max(1.0, abs(sums[0])) for s in sums), sums

    # ---- eval half: shard test tracklets across processes, track each shard
    # through the device loop, merge Success/Precision globally, and check the
    # merged metric equals a local full (unsharded) run (reference
    # merge_results_dist, common_utils.py:309-330).
    from ptt_tpu.config import cfg_from_yaml_file
    from ptt_tpu.data.loader import build_dataloader
    from ptt_tpu.eval.device_loop import DeviceTrackingEvaluator
    from ptt_tpu.eval.metrics import merged_main_metrics

    class ConstOffsetModel:
        OFFSET = np.array([0.12, -0.05, 0.02, 3.0], np.float32)

        def apply(self, variables, batch, train=False):
            import jax.numpy as jnp

            B = batch["search_points"].shape[0]
            data = np.zeros((B, 64, 5), np.float32)
            data[:, :, :4] = self.OFFSET
            data[:, 0, 4] = 5.0
            return {"pred_box_data": jnp.asarray(data)}

    eval_cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")
    ds_cfg = dict(eval_cfg.DATA_CONFIG)
    ds_cfg.update(
        DATASET="SyntheticTrackingDataset", NUM_TRACKLETS=4, FRAMES_PER_TRACKLET=6
    )
    # this process's shard (sharding slices within each delivered batch, so the
    # batch must be `world` tracklets -> one per process per global batch)
    _, shard_loader = build_dataloader(
        ds_cfg, ["Car"], batch_size=world, training=False,
        num_shards=world, shard_id=rank,
    )
    shard_trks = [trk for batch in shard_loader for trk in batch]
    assert 0 < len(shard_trks) < 4, len(shard_trks)  # actually sharded
    dev_ev = DeviceTrackingEvaluator(
        eval_cfg, ConstOffsetModel(), {}, max_points=2048, batch_size=2
    )
    dev_ev.track_batch(shard_trks)
    succ, prec, frames = merged_main_metrics(dev_ev.evaluator)
    assert frames == 4 * 6, frames  # merged count covers every shard

    # local full run for the expected global metric (the constant-offset model
    # ignores the resampled points, so trajectories are batching-independent)
    _, full_loader = build_dataloader(ds_cfg, ["Car"], batch_size=1, training=False)
    full_trks = [trk for batch in full_loader for trk in batch]
    ref_ev = DeviceTrackingEvaluator(
        eval_cfg, ConstOffsetModel(), {}, max_points=2048, batch_size=2
    )
    ref_ev.track_batch(full_trks)
    ref = ref_ev.summary()
    assert abs(succ - ref["success"]) < 1e-6, (succ, ref["success"])
    assert abs(prec - ref["precision"]) < 1e-6, (prec, ref["precision"])

    print(f"DIST-WORKER-OK rank={rank}/{world} loss={loss:.5f} param_sum={param_sum:.4f} "
          f"eval={succ:.4f}/{prec:.4f}")


if __name__ == "__main__":
    main()

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

    print(f"DIST-WORKER-OK rank={rank}/{world} loss={loss:.5f} param_sum={param_sum:.4f}")


if __name__ == "__main__":
    main()

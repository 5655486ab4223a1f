"""Eval CLI (reference tools/test_tracking.py).

Runs the autoregressive tracking evaluation for one checkpoint, or watches a
checkpoint directory and evaluates every new checkpoint as training produces them
(``--eval_all``, reference repeat_eval_ckpt :80-119).

Two execution paths:
  - the device-resident tracker (default): whole tracklets compiled into one XLA
    program, batched across tracklets — the deployment-speed path. Every TEST
    config runs here: all three REF_BOX modes and all four SHAPE_AGGREGATION
    modes including 'all' (the scan carries the predicted-box history);
  - ``--host_loop``: per-frame host loop with reference-exact crop/resample RNG
    semantics — opt in for parity runs against the reference evaluator.
"""

import argparse
import datetime
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from ptt_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file, log_config_to_file


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str,
                        default="tools/cfgs/kitti_models/ptt.yaml", help="config for eval")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="tracklets per device dispatch (device loop only)")
    parser.add_argument("--workers", type=int, default=2)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None, help="checkpoint dir to evaluate")
    parser.add_argument("--host_loop", action="store_true", default=False,
                        help="use the per-frame host evaluator (reference-exact RNG)")
    parser.add_argument("--max_points", type=int, default=16384,
                        help="per-frame point budget for the device tracker")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    parser.add_argument("--max_waiting_mins", type=int, default=120)
    parser.add_argument("--start_epoch", type=int, default=1)
    parser.add_argument("--eval_tag", type=str, default="default")
    parser.add_argument("--eval_all", action="store_true", default=False,
                        help="watch the ckpt dir and evaluate every new checkpoint")
    parser.add_argument("--ckpt_dir", type=str, default=None,
                        help="ckpt dir to watch with --eval_all")
    parser.add_argument("--launcher", choices=["none", "jax"], default="none",
                        help="'jax' initializes jax.distributed: each process evaluates "
                             "its shard of the test tracklets; metrics merge globally")
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    parts = Path(args.cfg_file).parts
    cfg.EXP_GROUP_PATH = "/".join(parts[parts.index("cfgs") + 1:-1]) if "cfgs" in parts else ""
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def init_variables(model, cfg):
    import jax
    import jax.numpy as jnp

    batch = {
        "search_points": jnp.zeros((1, int(cfg.DATA_CONFIG["SEARCH_INPUT_SIZE"]), 3)),
        "template_points": jnp.zeros((1, int(cfg.DATA_CONFIG["TEMPLATE_INPUT_SIZE"]), 3)),
    }
    return jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, train=False))(batch)


def eval_single_ckpt(args, cfg, model, loader, ckpt_path, logger, result_dir, epoch_tag="?",
                     _evaluator_cache=None):
    from ptt_tpu.eval import eval_one_epoch
    from ptt_tpu.eval.device_loop import eval_one_epoch_device
    from ptt_tpu.train import checkpoint

    variables = init_variables(model, cfg)
    if ckpt_path is not None:
        resolved = checkpoint.resolve_checkpoint_path(ckpt_path)
        params, batch_stats = checkpoint.load_params_from_file(
            resolved, variables["params"], variables.get("batch_stats", {}), logger
        )
        variables = {"params": params, "batch_stats": batch_stats}
    else:
        logger.info("no --ckpt given: evaluating a randomly initialized network")

    # every TEST config runs on device: all three REF_BOX modes plus all four
    # SHAPE_AGGREGATION modes including 'all' (box-history carry in the scan);
    # --host_loop remains for reference-exact-RNG parity runs
    if not args.host_loop:
        succ, prec, fps = eval_one_epoch_device(
            cfg, model, variables, loader, epoch_id=epoch_tag, logger=logger,
            max_points=args.max_points, batch_size=args.batch_size,
            result_dir=result_dir, _evaluator_cache=_evaluator_cache,
        )
    else:
        succ, prec = eval_one_epoch(
            cfg, model, variables, loader, epoch_id=epoch_tag, logger=logger,
            result_dir=result_dir,
        )
    return succ, prec


def repeat_eval_ckpt(args, cfg, model, loader, ckpt_dir, logger, result_dir,
                     poll_interval: float = 30.0, eval_fn=None):
    """Watch ``ckpt_dir`` for new checkpoints; evaluate each once; give up after
    ``--max_waiting_mins`` without a new one (reference test_tracking.py:80-119).
    ``eval_fn`` overrides the per-checkpoint evaluation (tests)."""
    if eval_fn is None:
        evaluator_cache = {}  # one compiled tracker reused across all checkpoints

        def eval_fn(*a, **k):
            return eval_single_ckpt(*a, **k, _evaluator_cache=evaluator_cache)

    ckpt_dir = Path(ckpt_dir)
    record_file = result_dir / "eval_list.txt"
    evaluated = set()
    if record_file.exists():
        evaluated = {
            int(line.split()[0])
            for line in record_file.read_text().splitlines()
            if line.strip()
        }
    wait_start = time.time()
    while True:
        steps = sorted(
            int(p.name) for p in ckpt_dir.iterdir() if p.is_dir() and p.name.isdigit()
        ) if ckpt_dir.exists() else []
        todo = [s for s in steps if s not in evaluated and s >= args.start_epoch]
        if not todo:
            if (time.time() - wait_start) / 60 >= args.max_waiting_mins:
                logger.info("max waiting time reached; stopping watcher")
                return
            time.sleep(poll_interval)
            continue
        wait_start = time.time()
        for step in todo:
            succ, prec = eval_fn(
                args, cfg, model, loader, ckpt_dir / str(step), logger,
                result_dir / f"epoch_{step}", epoch_tag=step,
            )
            evaluated.add(step)
            with open(record_file, "a") as f:
                f.write(f"{step} {succ:.2f} {prec:.2f}\n")


def main():
    args, _ = parse_config()

    # honor an explicit JAX_PLATFORMS before the first backend touch (the
    # session sitecustomize force-selects its own platform otherwise)
    from ptt_tpu.utils import apply_platform_env

    apply_platform_env()

    if args.launcher == "jax":
        import jax

        jax.distributed.initialize()

    import jax

    from ptt_tpu.data.loader import build_dataloader
    from ptt_tpu.nn import build_network
    from ptt_tpu.utils import create_logger, set_manual_seed

    set_manual_seed(2)  # reference test seed (test_tracking.py:127)
    process_index = jax.process_index()
    num_processes = jax.process_count()

    output_dir = REPO_ROOT / "output" / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    result_dir = output_dir / "eval" / args.eval_tag
    result_dir.mkdir(parents=True, exist_ok=True)
    log_file = result_dir / f"log_eval_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    logger = create_logger(log_file, rank=process_index)
    logger.info(f"devices: {jax.devices()} "
                f"(process {process_index}/{num_processes})")
    log_config_to_file(cfg, logger=logger)

    # each process evaluates its tracklet shard (reference: DistributedSampler on
    # the test set, datasets/__init__.py:57-64); metrics merge in eval_one_epoch*.
    # Sharding slices within each delivered batch, so the test loader's batch is
    # num_processes tracklets -> one per process per global batch.
    _, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=max(1, num_processes),
        workers=args.workers, logger=logger, training=False,
        num_shards=num_processes, shard_id=process_index,
    )
    model = build_network(cfg.MODEL)

    # MODEL.POINT_SHARDING (the ptt_waymo Waymo-scale config): install a
    # ('point',) mesh over the local devices — ops.square_distance / knn /
    # ball_query then shard their large-N query/center rows via shard_map
    # (ops/mesh_ctx.py). Orthogonal to the device loop's tracklet batching.
    ps_cfg = cfg.MODEL.get("POINT_SHARDING", {}) or {}
    if bool(ps_cfg.get("ENABLED", False)) and len(jax.local_devices()) > 1:
        import numpy as np
        from jax.sharding import Mesh

        from ptt_tpu.ops import mesh_ctx

        axis = str(ps_cfg.get("AXIS", "point"))
        point_mesh = Mesh(np.array(jax.local_devices()), (axis,))
        mesh_ctx.set_point_mesh(point_mesh, axis)
        logger.info(
            f"POINT_SHARDING on: point axis '{axis}' sharded over "
            f"{point_mesh.size} local devices"
        )

    if args.eval_all:
        ckpt_dir = args.ckpt_dir or (output_dir / "ckpt")
        repeat_eval_ckpt(args, cfg, model, loader, ckpt_dir, logger, result_dir)
    else:
        eval_single_ckpt(args, cfg, model, loader, args.ckpt, logger, result_dir)


if __name__ == "__main__":
    main()

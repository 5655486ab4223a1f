"""Train CLI (reference tools/train_tracking.py).

Same flag surface and output-directory layout
(``output/<exp_group>/<tag>/<extra_tag>/{ckpt,tensorboard}``), TPU-native internals:
the train step is pjit-sharded over a jax.sharding.Mesh of all local devices — data
parallelism that actually runs, unlike the reference's hardcoded-off DDP
(train_tracking.py:63). ``--sync_bn`` is accepted for compatibility but is a no-op:
batch-norm statistics are computed over the global (mesh-wide) batch inside the
compiled step, so SyncBN semantics hold by construction.

Multi-host: ``--launcher jax`` calls jax.distributed.initialize() (coordinator from
the standard JAX env vars); each process then loads its shard of every global batch.
"""

import argparse
import datetime
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from ptt_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file, log_config_to_file


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str,
                        default="tools/cfgs/kitti_models/ptt.yaml", help="config for training")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="global batch size (split across devices)")
    parser.add_argument("--epochs", type=int, default=None, help="number of epochs to train for")
    parser.add_argument("--workers", type=int, default=4, help="dataloader worker threads")
    parser.add_argument("--extra_tag", type=str, default="default", help="extra tag for this experiment")
    parser.add_argument("--ckpt", type=str, default=None, help="checkpoint dir to resume from")
    parser.add_argument("--pretrained_model", type=str, default=None,
                        help="model-only checkpoint for shape-checked partial init")
    parser.add_argument("--launcher", choices=["none", "jax"], default="none",
                        help="'jax' initializes jax.distributed for multi-host training")
    parser.add_argument("--sync_bn", action="store_true", default=False,
                        help="accepted for reference compatibility; BN stats are always "
                             "global-batch on the mesh (no-op)")
    parser.add_argument("--fix_random_seed", action="store_true", default=True)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER,
                        help="set extra config keys if needed")
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    parts = Path(args.cfg_file).parts
    cfg.EXP_GROUP_PATH = "/".join(parts[parts.index("cfgs") + 1:-1]) if "cfgs" in parts else ""
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


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
    from ptt_tpu.eval.device_loop import eval_one_epoch_device
    from ptt_tpu.nn import build_network
    from ptt_tpu.train import Trainer, checkpoint
    from ptt_tpu.utils import create_logger, set_manual_seed

    process_index = jax.process_index()
    num_processes = jax.process_count()

    if args.fix_random_seed:
        set_manual_seed(args.seed)

    output_dir = REPO_ROOT / "output" / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    output_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    logger = create_logger(log_file, rank=process_index)

    logger.info("**********************Start logging**********************")
    logger.info(f"devices: {jax.device_count()} ({jax.local_device_count()} local), "
                f"process {process_index}/{num_processes}")
    log_config_to_file(cfg, logger=logger)

    batch_size = args.batch_size or cfg.OPTIMIZATION["BATCH_SIZE_PER_GPU"]
    if args.epochs is not None:
        cfg.OPTIMIZATION["NUM_EPOCHS"] = args.epochs

    dataset, train_loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        workers=args.workers, logger=logger, training=True, seed=args.seed,
        num_shards=num_processes, shard_id=process_index,
    )
    logger.info(f"train dataset: {len(dataset)} samples, {len(train_loader)} iters/epoch")

    model = build_network(cfg.MODEL)

    tb_writer = None
    if process_index == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(str(output_dir / "tensorboard"))
        except ImportError:
            logger.info("tensorboard unavailable; scalar logging disabled")

    eval_fn = None
    with_eval = cfg.get("TRAIN", {}).get("WITH_EVAL", {})
    if with_eval.get("ENABLE", False):
        # shard the test tracklets across processes like tools/test_tracking.py
        # (metrics merge globally in eval_one_epoch_device); without this every
        # process would evaluate — and the merge would count — the full test set
        _, test_loader = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=max(1, num_processes),
            workers=args.workers, logger=logger, training=False, seed=args.seed,
            num_shards=num_processes, shard_id=process_index,
        )
        start_ep = int(with_eval.get("START_EPOCH", 0))
        interval = int(with_eval.get("INTERVAL", 1))
        eval_state = {}  # one evaluator reused across epochs (compiled once)

        def eval_fn(state, epoch):
            if epoch < start_ep or epoch % interval:
                return {}
            succ, prec, fps = eval_one_epoch_device(
                cfg, model, {"params": state.params, "batch_stats": state.batch_stats},
                test_loader, epoch_id=epoch, logger=logger,
                _evaluator_cache=eval_state,
            )
            return {"succ": succ, "prec": prec, "fps": fps}

    trainer = Trainer(
        model, cfg.MODEL, cfg.OPTIMIZATION, train_loader,
        output_dir, logger,
        seed=args.seed,
        max_ckpt_save_num=args.max_ckpt_save_num,
        ckpt_save_interval=args.ckpt_save_interval,
        tb_writer=tb_writer,
        eval_fn=eval_fn,
    )

    if args.pretrained_model:
        if str(args.pretrained_model).endswith((".pth", ".pt")):
            # reference torch checkpoint: convert on the fly (non-strict, like the
            # reference's shape-checked partial load)
            from ptt_tpu.utils.torch_converter import load_torch_checkpoint

            params, batch_stats, report = load_torch_checkpoint(
                args.pretrained_model, trainer.state.params, trainer.state.batch_stats,
                strict=False,
            )
            for line in report["missing"] + report["unused"]:
                logger.info(f"converter: {line}")
        else:
            params, batch_stats = checkpoint.load_params_from_file(
                checkpoint.resolve_checkpoint_path(args.pretrained_model),
                trainer.state.params, trainer.state.batch_stats, logger,
            )
        trainer.state = trainer.state.replace(params=params, batch_stats=batch_stats)
        logger.info(f"initialized from pretrained model {args.pretrained_model}")

    trainer.resume()  # auto-resume from newest ckpt in the run dir (reference :149-155)

    logger.info("**********************Start training**********************")
    trainer.train()
    logger.info("**********************Training done**********************")


if __name__ == "__main__":
    main()

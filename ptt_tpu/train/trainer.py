"""The epoch-driven trainer (reference tools/train_utils/train_utils.py:10-150).

One object owns: the mesh-sharded jitted train step, the LR schedule (queried per
iteration for logging, reference :26-35), tensorboard scalars (:60-70), rolling orbax
checkpoints with auto-resume (:120-132, train_tracking.py:149-155), and the optional
eval-during-training hook (:134-150).

TPU shape: the step function is compiled once (static batch shapes), the host loop
overlaps data preprocessing with device compute via the prefetching DataLoader, and
on a multi-device mesh the batch is sharded along 'data' with XLA inserting the
gradient all-reduce — real data parallelism, unlike the reference's dead DDP switch
(train_tracking.py:63).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from ..utils.common import MovingAverage
from .checkpoint import CheckpointManager
from .optim import build_optimizer_and_schedule
from .train_state import (
    create_train_state,
    make_data_mesh,
    make_sharded_multi_step,
    make_sharded_train_step,
    shard_batch,
    stack_shard_batches,
)


class Trainer:
    def __init__(
        self,
        model,
        model_cfg,
        optim_cfg,
        train_loader,
        output_dir,
        logger,
        total_epochs: int = None,
        seed: int = 0,
        max_ckpt_save_num: int = 30,
        ckpt_save_interval: int = 1,
        tb_writer=None,
        eval_fn=None,
        mesh=None,
        tb_flush_interval: int = 50,
    ):
        self.model = model
        self.model_cfg = model_cfg
        self.train_loader = train_loader
        self.logger = logger
        self.total_epochs = int(
            total_epochs if total_epochs is not None else optim_cfg["NUM_EPOCHS"]
        )
        self.tb_writer = tb_writer
        self.eval_fn = eval_fn
        self.tb_flush_interval = int(tb_flush_interval)

        self.mesh = mesh if mesh is not None else make_data_mesh()
        iters_per_epoch = len(train_loader)
        tx, self.lr_schedule = build_optimizer_and_schedule(
            optim_cfg, iters_per_epoch, self.total_epochs
        )

        # optional BN-momentum schedule (reference BNMomentumScheduler; see
        # bn_momentum.py for the recompile-free EMA correction)
        self.bn_sched_cfg = optim_cfg.get("BN_SCHEDULER")

        sample_batch = self._sample_batch()
        self.state = create_train_state(
            model, tx, sample_batch, rng=jax.random.PRNGKey(seed)
        )
        # f32 is the trainer default again since round 5: the measured roofline
        # (tools/train_ablate.py, docs/PERFORMANCE.md "Train-step roofline") has
        # the fused-kernel step HBM-bound at 88% of the bandwidth roofline, and
        # bf16 does NOT remove bytes there (the grouped tensor never leaves
        # VMEM; the residual traffic is f32 optimizer/BN state) — it only adds
        # cast work, measuring 9% SLOWER (98.6 vs 90.2 ms at batch 48). bf16
        # still wins on the unfused jnp group path (102.1 vs 111.8 ms), where
        # the grouped activations do hit HBM — round 4's +10% was measured
        # there. Opt in with OPTIMIZATION.MIXED_PRECISION: True.
        mixed_precision = bool(optim_cfg.get("MIXED_PRECISION", False))
        # the default flipped bf16->f32 across rounds — surface the effective
        # precision in every run log so a silently-changed numeric regime is
        # visible when re-running an older config
        self.logger.info(
            "mixed_precision=%s (%s; set OPTIMIZATION.MIXED_PRECISION: %s to flip)"
            % (
                "bf16" if mixed_precision else "f32",
                "default" if "MIXED_PRECISION" not in optim_cfg else "from config",
                not mixed_precision,
            )
        )
        self.train_step = make_sharded_train_step(
            model_cfg,
            self.mesh,
            with_bn_momentum=bool(self.bn_sched_cfg),
            mixed_precision=mixed_precision,
        )
        # OPTIMIZATION.STEPS_PER_DISPATCH > 1 scans K steps inside ONE dispatch
        # (exact same math as K sequential steps — make_sharded_multi_step):
        # on dispatch-latency-bound hosts one fixed dispatch cost amortizes
        # over K. Epoch-tail batches that don't fill a group take the single
        # step above.
        self.steps_per_dispatch = max(1, int(optim_cfg.get("STEPS_PER_DISPATCH", 1)))
        self.multi_step = None
        if self.steps_per_dispatch > 1:
            self.logger.info(
                f"steps_per_dispatch={self.steps_per_dispatch} "
                f"(K-step scan per device dispatch)"
            )
            self.multi_step = make_sharded_multi_step(
                model_cfg,
                self.mesh,
                self.steps_per_dispatch,
                with_bn_momentum=bool(self.bn_sched_cfg),
                mixed_precision=mixed_precision,
            )
        self.ckpt = CheckpointManager(
            str(output_dir) + "/ckpt", max_to_keep=max_ckpt_save_num
        )
        self.ckpt_save_interval = int(ckpt_save_interval)
        self.output_dir = Path(output_dir)
        self.start_epoch = 0
        self.accumulated_iter = 0
        self._best_succ = float("-inf")

    def _sample_batch(self):
        """One batch for shape-driven init, without consuming the epoch iterator."""
        for batch in self.train_loader:
            return batch
        raise RuntimeError("train loader is empty")

    def resume(self):
        """Auto-resume from the newest checkpoint in the run dir (reference
        train_tracking.py:149-155)."""
        if self.ckpt.latest_epoch() is None:
            self.logger.info("no checkpoint found; starting from scratch")
            return self
        self.state, last_epoch = self.ckpt.restore(self.state)
        self.start_epoch = last_epoch
        self.accumulated_iter = int(self.state.step)
        self.logger.info(
            f"resumed from epoch {last_epoch} (step {self.accumulated_iter})"
        )
        return self

    def _flush_tb(self, buffer):
        """Write buffered per-step scalars. Values are device arrays dispatched
        many steps ago, so the float() reads here don't stall the pipeline the way
        a per-iteration read would (the metric for step k is read only after step
        k + tb_flush_interval was dispatched). Multi-step dispatches buffer
        (step_i, metrics, j): metric leaves carry a leading (K,) axis and j picks
        the in-dispatch step."""
        for step_i, metrics, j in buffer:
            # lr used BY update step_i is schedule(step_i - 1): optax passes the
            # pre-increment count (reference logs the same cur_lr, train_utils.py:30)
            cur_lr = float(self.lr_schedule(step_i - 1))
            self.tb_writer.add_scalar("meta_data/learning_rate", cur_lr, step_i)
            for key, val in metrics.items():
                v = val if j is None else val[j]
                self.tb_writer.add_scalar(f"train/{key}", float(v), step_i)
        buffer.clear()

    def _run_epoch_multi(self, step_args, tb_buffer):
        """One epoch at STEPS_PER_DISPATCH > 1: groups of K host batches stack
        into one (K, B, ...) upload + one scan dispatch; the epoch tail (fewer
        than K batches) runs through the single-step path. Returns the last
        dispatch's metrics (leaves (K,) for full groups, scalars for the tail)."""
        k = self.steps_per_dispatch
        group, metrics = [], None
        for batch in self.train_loader:
            group.append(batch)
            if len(group) < k:
                continue
            stacked = stack_shard_batches(group, self.mesh)
            group = []
            self.state, metrics = self.multi_step(self.state, stacked, *step_args)
            base = self.accumulated_iter
            self.accumulated_iter += k
            if self.tb_writer is not None:
                tb_buffer.extend((base + j + 1, metrics, j) for j in range(k))
                if len(tb_buffer) >= self.tb_flush_interval:
                    self._flush_tb(tb_buffer)
        for batch in group:  # epoch tail
            self.state, metrics = self.train_step(
                self.state, shard_batch(batch, self.mesh), *step_args
            )
            self.accumulated_iter += 1
            if self.tb_writer is not None:
                tb_buffer.append((self.accumulated_iter, metrics, None))
        return metrics

    def train(self):
        """Epoch loop (reference train_model, train_utils.py:77-150).

        Hot-loop discipline: every iteration only *dispatches* work — the jitted
        step, then the next batch's async host->device upload (which overlaps the
        running step) — and buffers tensorboard scalars as device arrays. Nothing
        in the loop blocks on the device; the one sync point is the per-epoch
        finite-loss check."""
        import jax.numpy as jnp

        loss_avg = MovingAverage(50)
        n_iters = len(self.train_loader)
        for epoch in range(self.start_epoch, self.total_epochs):
            self.train_loader.set_epoch(epoch)
            t0 = time.perf_counter()
            metrics = None
            step_args = ()
            if self.bn_sched_cfg:
                from .bn_momentum import bn_momentum_for_epoch

                torch_m = bn_momentum_for_epoch(
                    epoch,
                    bn_init=float(self.bn_sched_cfg.get("BN_INIT", 0.5)),
                    bn_decay=float(self.bn_sched_cfg.get("BN_DECAY", 0.5)),
                    decay_step=int(self.bn_sched_cfg.get("DECAY_STEP", 20)),
                    bn_clip=float(self.bn_sched_cfg.get("BN_CLIP", 0.01)),
                )
                step_args = (jnp.float32(1.0 - torch_m),)
            tb_buffer = []
            if self.multi_step is not None:
                metrics = self._run_epoch_multi(step_args, tb_buffer)
            else:
                batch_iter = iter(self.train_loader)
                batch = next(batch_iter, None)
                batch = shard_batch(batch, self.mesh) if batch is not None else None
                while batch is not None:
                    self.state, metrics = self.train_step(self.state, batch, *step_args)
                    # upload batch k+1 while step k runs (the eval loop already
                    # pipelines this way; device_put is async w.r.t. the device queue)
                    nxt = next(batch_iter, None)
                    batch = shard_batch(nxt, self.mesh) if nxt is not None else None
                    self.accumulated_iter += 1
                    if self.tb_writer is not None:
                        tb_buffer.append((self.accumulated_iter, metrics, None))
                        if len(tb_buffer) >= self.tb_flush_interval:
                            self._flush_tb(tb_buffer)
            if self.tb_writer is not None and tb_buffer:
                self._flush_tb(tb_buffer)
            # block once per epoch for accurate wall-clock + finite-loss check;
            # a multi-step epoch's last metrics carry a (K,) axis — take the
            # final in-dispatch step
            metrics = {
                k: float(np.asarray(v).reshape(-1)[-1])
                for k, v in jax.device_get(metrics).items()
            }
            loss_avg.append(metrics["loss"])
            dt = time.perf_counter() - t0
            self.logger.info(
                f"epoch {epoch + 1}/{self.total_epochs}  "
                f"loss {metrics['loss']:.4f} (avg {loss_avg.get_avg():.4f})  "
                f"lr {float(self.lr_schedule(self.accumulated_iter)):.2e}  "
                f"{dt:.1f}s ({dt / max(1, n_iters) * 1e3:.0f} ms/it)"
            )
            if not np.isfinite(metrics["loss"]):
                raise FloatingPointError(f"non-finite loss at epoch {epoch + 1}")

            trained_epoch = epoch + 1
            if trained_epoch % self.ckpt_save_interval == 0 or trained_epoch == self.total_epochs:
                self.ckpt.save(self.state, trained_epoch)
            if self.eval_fn is not None:
                eval_metrics = self.eval_fn(self.state, trained_epoch)
                if self.tb_writer is not None and eval_metrics:
                    for key, val in eval_metrics.items():
                        self.tb_writer.add_scalar(f"eval/{key}", float(val), trained_epoch)
                # keep the best-Success model outside the rolling window (the
                # autoregressive eval fluctuates; the peak epoch would otherwise
                # be pruned by max_ckpt_save_num)
                succ = (eval_metrics or {}).get("succ")
                if succ is not None and succ > self._best_succ:
                    self._best_succ = float(succ)
                    from .checkpoint import save_variables

                    save_variables(
                        self.output_dir / "ckpt_best",
                        self.state.params,
                        self.state.batch_stats,
                        metadata={"epoch": trained_epoch, "succ": float(succ),
                                  "prec": float(eval_metrics.get("prec", -1.0))},
                    )
                    self.logger.info(
                        f"new best Success {succ:.1f} at epoch {trained_epoch}; "
                        f"saved model-only checkpoint to ckpt_best"
                    )
        return self.state

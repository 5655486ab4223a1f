"""Optimizers and LR schedules (reference tools/train_utils/optimization/).

Supported like the reference's build_optimizer/build_scheduler
(optimization/__init__.py:11-53):
  - OPTIMIZER: adam / adamw / sgd / adam_onecycle
  - SCHEDULER: 'step' (epoch-stepped StepLR; the shipped configs use this) or absent
    -> fastai-style OneCycle over total iterations (cosine warmup of LR with inverse
    momentum annealing, reference learning_schedules_fastai.py:60-77).

torch semantics preserved: Adam weight_decay is L2-into-gradient (not decoupled);
adamw is decoupled; grad clipping is by global norm (train_utils.py:49).
"""

from __future__ import annotations

import optax


def _step_lr_schedule(base_lr: float, step_size_epochs: int, gamma: float, iters_per_epoch: int):
    """StepLR stepped per epoch: lr = base * gamma^(epoch // step_size)."""

    def schedule(count):
        epoch = count // max(1, iters_per_epoch)
        return base_lr * (gamma ** (epoch // step_size_epochs))

    return schedule


def build_optimizer_and_schedule(optim_cfg, iters_per_epoch: int, total_epochs: int):
    """Returns (optax.GradientTransformation, lr_schedule_fn).

    The lr schedule is returned separately so the trainer can log the current LR
    (reference train_utils.py:30-35).
    """
    name = optim_cfg["OPTIMIZER"]
    base_lr = float(optim_cfg["LR"])
    wd = float(optim_cfg.get("WEIGHT_DECAY", 0.0))
    total_steps = max(1, iters_per_epoch * total_epochs)

    scheduler = optim_cfg.get("SCHEDULER")
    if scheduler == "step":
        lr_schedule = _step_lr_schedule(
            base_lr, int(optim_cfg["STEP_SIZE"]), float(optim_cfg["GAMMA"]), iters_per_epoch
        )
    elif scheduler is None or name == "adam_onecycle":
        lr_schedule = optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=base_lr,
            pct_start=float(optim_cfg.get("PCT_START", 0.4)),
            div_factor=float(optim_cfg.get("DIV_FACTOR", 10.0)),
            final_div_factor=1e4,
        )
    else:
        raise NotImplementedError(f"scheduler {scheduler!r}")

    if name == "adam":
        betas = [float(b) for b in optim_cfg.get("BETAS", [0.9, 0.999])]
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd > 0 else optax.identity(),
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=float(optim_cfg.get("EPS", 1e-8))),
            optax.scale_by_learning_rate(lr_schedule),
        )
    elif name == "adamw":
        betas = [float(b) for b in optim_cfg.get("BETAS", [0.9, 0.999])]
        tx = optax.adamw(
            lr_schedule,
            b1=betas[0],
            b2=betas[1],
            eps=float(optim_cfg.get("EPS", 1e-8)),
            weight_decay=wd,
        )
    elif name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd > 0 else optax.identity(),
            optax.sgd(lr_schedule, momentum=float(optim_cfg.get("MOMENTUM", 0.9))),
        )
    elif name == "adam_onecycle":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd > 0 else optax.identity(),
            optax.scale_by_adam(b1=0.9, b2=0.99),
            optax.scale_by_learning_rate(lr_schedule),
        )
    else:
        raise NotImplementedError(f"optimizer {name!r}")

    clip = optim_cfg.get("GRAD_NORM_CLIP")
    if clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
    return tx, lr_schedule

"""Optimizers and LR schedules (reference tools/train_utils/optimization/).

Supported like the reference's build_optimizer/build_scheduler
(optimization/__init__.py:11-53):
  - OPTIMIZER: adam / adamw / sgd / adam_onecycle
  - SCHEDULER: 'step' (epoch-stepped StepLR; the shipped configs use this) or absent
    -> fastai-style OneCycle (learning_schedules_fastai.py:60-77).

torch semantics preserved:
  - Adam weight_decay is L2-into-gradient (not decoupled); adamw is decoupled;
    grad clipping is by global norm (train_utils.py:49).
  - adam_onecycle reproduces the full fastai stack value-for-value:
    * LR: cosine anneal lr_max/DIV_FACTOR -> lr_max over the first PCT_START of
      steps, then lr_max -> lr_max/DIV_FACTOR/1e4 over the rest
      (learning_schedules_fastai.py:53-72, stepped per-iteration before the
      optimizer step, train_utils.py:26).
    * Momentum: Adam's b1 is cosine-annealed MOMS[0] -> MOMS[1] during warmup and
      back during the anneal (the `mom_phases`, learning_schedules_fastai.py:73-75;
      OptimWrapper routes `.mom` into betas[0], fastai_optim.py:178-184).
    * Weight decay: true-wd (decoupled) applied to ALL params including BN/bias
      (`OptimWrapper.create(..., true_wd=True, bn_wd=True)`,
      optimization/__init__.py:33-35; the `p.mul_(1 - wd*lr)` before the step,
      fastai_optim.py:136-147 — algebraically optax's add_decayed_weights placed
      AFTER scale_by_adam and BEFORE the lr scaling).
    The reference's single flattened layer group (optimization/__init__.py:30-31)
    makes the per-group machinery collapse to scalar hyperparams, which is what a
    jax pytree optimizer applies anyway.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def _step_lr_schedule(base_lr: float, step_size_epochs: int, gamma: float, iters_per_epoch: int):
    """StepLR stepped per epoch: lr = base * gamma^(epoch // step_size)."""

    def schedule(count):
        epoch = count // max(1, iters_per_epoch)
        return base_lr * (gamma ** (epoch // step_size_epochs))

    return schedule


def _annealing_cos(start: float, end: float, pct):
    """fastai cosine anneal: start -> end as pct goes 0 -> 1
    (learning_schedules_fastai.py:53-57)."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def fastai_onecycle_schedules(total_steps: int, lr_max: float, moms, div_factor: float,
                              pct_start: float):
    """Value-exact port of the fastai OneCycle schedule pair
    (learning_schedules_fastai.py:60-77 + the phase stepping at :44-50).

    Returns (lr_schedule, mom_schedule), each mapping the 0-based update count to
    the hyperparameter used for that update (the reference calls
    ``lr_scheduler.step(accumulated_iter)`` *before* ``optimizer.step()``,
    train_utils.py:26, so update k sees the phase value at step=k).
    """
    a1 = int(total_steps * pct_start)
    low_lr = lr_max / div_factor
    up = max(1, a1)
    down = max(1, total_steps - a1)
    m0, m1 = float(moms[0]), float(moms[1])

    def lr_schedule(count):
        count = jnp.asarray(count, jnp.float32)
        return jnp.where(
            count < a1,
            _annealing_cos(low_lr, lr_max, count / up),
            _annealing_cos(lr_max, low_lr / 1e4, (count - a1) / down),
        )

    def mom_schedule(count):
        count = jnp.asarray(count, jnp.float32)
        return jnp.where(
            count < a1,
            _annealing_cos(m0, m1, count / up),
            _annealing_cos(m1, m0, (count - a1) / down),
        )

    return lr_schedule, mom_schedule


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
    mom_schedule = None
    if scheduler == "step":
        lr_schedule = _step_lr_schedule(
            base_lr, int(optim_cfg["STEP_SIZE"]), float(optim_cfg["GAMMA"]), iters_per_epoch
        )
    elif scheduler is None or name == "adam_onecycle":
        lr_schedule, mom_schedule = fastai_onecycle_schedules(
            total_steps,
            base_lr,
            [float(m) for m in optim_cfg.get("MOMS", [0.95, 0.85])],
            float(optim_cfg.get("DIV_FACTOR", 10.0)),
            float(optim_cfg.get("PCT_START", 0.4)),
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
        # fastai OptimWrapper(Adam(betas=(b1_annealed, 0.99)), true_wd on all params)
        if mom_schedule is not None:
            adam = optax.inject_hyperparams(optax.scale_by_adam)(b1=mom_schedule, b2=0.99)
        else:  # SCHEDULER='step' with adam_onecycle: no phase to anneal over
            adam = optax.scale_by_adam(b1=0.9, b2=0.99)
        tx = optax.chain(
            adam,
            optax.add_decayed_weights(wd) if wd > 0 else optax.identity(),
            optax.scale_by_learning_rate(lr_schedule),
        )
    else:
        raise NotImplementedError(f"optimizer {name!r}")

    clip = optim_cfg.get("GRAD_NORM_CLIP")
    if clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
    return tx, lr_schedule

"""BatchNorm momentum scheduling (reference pytorch_utils.BNMomentumScheduler:438,
pointnet2 convention: torch momentum 0.5 * 0.5^(epoch // 20), clipped at 0.01 —
library code the reference never actually invokes; here it is a working, opt-in
trainer feature).

flax BatchNorm's momentum is a construction-time constant, so instead of rebuilding
and recompiling the model per epoch, the schedule is applied OUTSIDE the compiled
step as an exact EMA correction: the step computes
``stats' = m0 * old + (1 - m0) * obs`` with the fixed model momentum ``m0``; the
observed batch statistic is recovered as ``obs = (stats' - m0 * old) / (1 - m0)``
and re-blended with the scheduled momentum. Pure pytree arithmetic, jitted once.

Momentum conventions: torch momentum ``tm`` weights the NEW observation
(``new = (1 - tm) * old + tm * obs``); flax momentum ``m`` weights the OLD stats.
The schedule below is stated in torch momentum like the reference; the correction
works in flax momentum ``m = 1 - tm``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MODEL_BN_MOMENTUM = 0.9  # flax momentum baked into SharedMLP/ConvStack (layers.py)


def bn_momentum_for_epoch(epoch: int, bn_init: float = 0.5, bn_decay: float = 0.5,
                          decay_step: int = 20, bn_clip: float = 0.01) -> float:
    """Torch-convention momentum schedule (pointnet2's lr_lbmd pattern)."""
    return max(bn_init * bn_decay ** (epoch // decay_step), bn_clip)


@functools.partial(jax.jit, donate_argnums=(1,))
def rescale_batch_stats(old_stats, new_stats, target_flax_momentum):
    """Re-blend ``new_stats`` (computed with MODEL_BN_MOMENTUM) as if the step had
    used ``target_flax_momentum`` instead. Exact for a single step."""
    m0 = MODEL_BN_MOMENTUM
    mt = jnp.asarray(target_flax_momentum, jnp.float32)

    def fix(old, new):
        obs = (new - m0 * old) / (1.0 - m0)
        return mt * old + (1.0 - mt) * obs

    return jax.tree_util.tree_map(fix, old_stats, new_stats)

"""Building-block layers: pointwise MLP stacks with BatchNorm.

TPU-first re-design of the reference's ``pytorch_utils.SharedMLP`` / ``Seq().conv1d``
blocks (ptt/models/backbones_3d/pointnet2/pytorch_utils.py:12-260): 1x1 convolutions
over channel-first tensors become plain ``Dense`` layers over channel-LAST tensors, so
every "conv" is a single MXU matmul with the feature dim on the 128-wide lane axis.

Initializers match the reference's statistics: kaiming-normal for conv/Dense kernels
inside BN stacks (pytorch_utils._ConvBase init), torch-Linear default
(uniform +-1/sqrt(fan_in)) for bare Linear layers in the transformer blocks.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import random


def kaiming_normal_init():
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def torch_linear_kernel_init():
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / jnp.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """Dense with torch nn.Linear default init (used by the transformer blocks)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(fan_in),
        )(x)


class MLP2(nn.Module):
    """Linear -> ReLU -> Linear (the fc_delta / fc_gamma pattern in variants.py)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = Linear(self.hidden)(x)
        x = nn.relu(x)
        return Linear(self.out)(x)


class SharedMLP(nn.Module):
    """Stack of pointwise Dense(+BN+ReLU) layers applied over the last axis.

    Equivalent to the reference SharedMLP (1x1 Conv2d stacks over (B, C, np, ns),
    pytorch_utils.py:12-36) but channel-last: input (..., C_in) -> (..., channels[-1]).
    BatchNorm statistics reduce over every axis but the last (== torch BatchNorm2d).
    Under pjit with a batch-sharded input, XLA turns the batch reduction into a
    cross-device collective automatically — SyncBN for free.
    """

    channels: Sequence[int]  # [in, h1, ..., out]; channels[0] is informational
    bn: bool = True
    activation: Callable | None = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False, first_linear_apply=None):
        """``first_linear_apply``: optional hook replacing layer 0's Dense with a
        caller-supplied function of its kernel weights — used by the fused
        grouped-first-linear TPU path (ops/pallas_group.py), where the layer-0
        matmul happens inside a Pallas kernel that never materializes the
        gathered input. Layer 0's params are still created (dummy bind), so the
        parameter tree is identical either way. Names are pinned to the flax
        autonames (Dense_i / BatchNorm_i) so checkpoints are unaffected.
        """
        for i, c in enumerate(self.channels[1:]):
            if i == 0 and first_linear_apply is not None:
                # the fused grouped-first-linear kernel is bias-free; layer 0
                # only has no bias when BN follows it
                assert self.bn, "first_linear_apply requires bn=True (bias-free Dense_0)"
                dense = nn.Dense(
                    c, use_bias=not self.bn, kernel_init=kaiming_normal_init(),
                    name="Dense_0",
                )
                dense(jnp.zeros((1, self.channels[0]), jnp.float32))  # bind params
                x = first_linear_apply(dense.variables["params"]["kernel"])
            else:
                x = nn.Dense(
                    c, use_bias=not self.bn, kernel_init=kaiming_normal_init(),
                    name=f"Dense_{i}",
                )(x)
            if self.bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name=f"BatchNorm_{i}",
                )(x)
            if self.activation is not None:
                x = self.activation(x)
        return x


class ConvStack(nn.Module):
    """The ``Seq(c0).conv1d(c1, bn=True)...conv1d(cn, activation=None)`` pattern:
    all layers BN+ReLU except the last, which is a bare linear projection."""

    channels: Sequence[int]  # [in, h1, ..., out]
    bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.channels) - 1
        for i, c in enumerate(self.channels[1:]):
            last = i == n - 1
            use_bn = self.bn and not last
            x = nn.Dense(c, use_bias=not use_bn, kernel_init=kaiming_normal_init())(x)
            if use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
            if not last:
                x = nn.relu(x)
        return x

"""PointNet++ set-abstraction module (VoteNet flavor: returns sampled indices).

Re-design of ``PointnetSAModuleVotes`` (reference pointnet2_modules.py:22-91) on the
channel-last op set: sample centers (fps / ffps / rs / sequence), ball-query + group a
fixed-size neighborhood, run the shared MLP, max-pool over the neighborhood.

Two compute paths:
  - train (and CPU): jnp ball-query + group -> SharedMLP -> max. BatchNorm needs
    global batch statistics, so training must see the whole grouped tensor.
  - eval on TPU: ONE fused Pallas kernel (ops.pallas_sa) — ball-query, grouping,
    the BN-folded MLP, and the neighborhood max never leave VMEM. XLA cannot fuse
    a gather into a matmul operand, so the jnp path materializes the grouped
    (B, npoint, nsample, C+3) tensor in HBM at 5-22 ms per stage on a v5e
    (measured; docs/PERFORMANCE.md), which the kernel removes.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .. import ops
from ..ops import pallas_sa
from .layers import SharedMLP


def sample_indices(method: str, xyz: jnp.ndarray, features: jnp.ndarray | None, npoint: int) -> jnp.ndarray:
    """Center-sampling strategy switch (reference pointnet2_modules.py:62-75).

    'rs' and 'sequence' are both arange in the reference (:69-71) — kept as such.
    'ffps' = FPS on squared distances in [xyz | features] space (:64-67).
    """
    B = xyz.shape[0]
    if method == "fps":
        return ops.furthest_point_sample(xyz, npoint)
    elif method == "ffps":
        fused = xyz if features is None else jnp.concatenate([xyz, features], axis=-1)
        d2 = ops.square_distance(fused, fused)
        return ops.furthest_point_sample_with_dist(d2, npoint)
    elif method in ("rs", "sequence"):
        ar = jnp.arange(npoint, dtype=jnp.int32)
        return jnp.broadcast_to(ar[None, :], (B, npoint))
    else:
        raise NotImplementedError(f"unknown sample method {method!r}")


class PointnetSAModule(nn.Module):
    """Set abstraction: (B, N, 3) xyz + (B, N, C) features -> npoint centers.

    Attributes:
      mlp_channels: [C_in, h1, ..., C_out]; +3 is added internally when use_xyz.
    ``npoint`` is a (static) call argument like the reference's forward(npoint=...),
    so one weight set serves both Siamese branch sizes.
    Returns (new_xyz (B, npoint, 3), new_features (B, npoint, C_out), inds (B, npoint)).
    """

    mlp_channels: Sequence[int]
    radius: float
    nsample: int
    use_xyz: bool = True
    normalize_xyz: bool = True
    sample_method: str = "fps"
    bn: bool = True

    @nn.compact
    def __call__(self, xyz, features=None, npoint: int = None, train: bool = False,
                 inds=None):
        if inds is None:
            inds = sample_indices(self.sample_method, xyz, features, npoint)
        new_xyz = ops.gather_points(xyz, inds)

        mlp_spec = list(self.mlp_channels)
        if self.use_xyz:
            mlp_spec[0] += 3
        mlp = SharedMLP(mlp_spec, bn=self.bn)

        if not train and pallas_sa.fused_enabled():
            # bind the SharedMLP variables on a dummy so the param tree (and any
            # loaded checkpoint) is identical to the jnp path, then fold eval-mode
            # BN into the Dense kernels and run the fused kernel
            mlp(jnp.zeros((1, 1, 1, mlp_spec[0]), jnp.float32), train=False)
            v = mlp.variables
            weights, biases = [], []
            for i in range(len(mlp_spec) - 1):
                w = v["params"][f"Dense_{i}"]["kernel"]
                if self.bn:
                    bn_p = v["params"][f"BatchNorm_{i}"]
                    bn_s = v["batch_stats"][f"BatchNorm_{i}"]
                    w, b = pallas_sa.fold_bn(
                        w, bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"]
                    )
                else:
                    b = v["params"][f"Dense_{i}"]["bias"]
                weights.append(w)
                biases.append(b)
            new_features = pallas_sa.fused_sa_inference(
                xyz,
                new_xyz,
                features,
                float(self.radius),
                int(self.nsample),
                tuple(weights),
                tuple(biases),
                normalize_xyz=self.normalize_xyz,
                use_xyz=self.use_xyz,
                interpret=pallas_sa.FORCE_INTERPRET,
            )
            return new_xyz, new_features, inds

        if train and self.bn and pallas_sa.fused_enabled():
            # TRAIN on TPU: the SA stage can't fuse whole (BatchNorm needs the
            # global batch statistics of every layer's pre-activation), but the
            # neighborhood gather CAN — measured at 32% of the train step
            # (docs/PERFORMANCE.md). grouped_first_linear runs ball-query +
            # group + the layer-0 matmul in one kernel with a custom VJP whose
            # backward is a one-hot transpose matmul (never an XLA scatter);
            # layers >= 1 stay flax (BN stats/updates identical to the jnp
            # path). Output is slot-major (B, nsample, npoint, H) — BN/Dense
            # are axis-agnostic; the neighborhood max pools axis 1.
            from ..ops import pallas_group

            def first_linear(w1):
                return pallas_group.grouped_first_linear(
                    xyz, new_xyz, features, w1,
                    float(self.radius), int(self.nsample),
                    normalize_xyz=self.normalize_xyz, use_xyz=self.use_xyz,
                    interpret=pallas_sa.FORCE_INTERPRET,
                )

            new_features = mlp(None, train=train, first_linear_apply=first_linear)
            new_features = jnp.max(new_features, axis=1)
            return new_xyz, new_features, inds

        grouped, _, _ = ops.query_and_group(
            self.radius,
            self.nsample,
            xyz,
            new_xyz,
            features,
            use_xyz=self.use_xyz,
            normalize_xyz=self.normalize_xyz,
        )  # (B, npoint, nsample, C[+3])

        new_features = mlp(grouped, train=train)
        new_features = jnp.max(new_features, axis=2)  # max over the neighborhood
        return new_xyz, new_features, inds

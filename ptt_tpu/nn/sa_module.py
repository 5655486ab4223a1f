"""PointNet++ set-abstraction module (VoteNet flavor: returns sampled indices).

Re-design of ``PointnetSAModuleVotes`` (reference pointnet2_modules.py:22-91) on the
channel-last op set: sample centers (fps / ffps / rs / sequence), ball-query + group a
fixed-size neighborhood, run the shared MLP, max-pool over the neighborhood.

On TPU the grouped tensor (B, npoint, nsample, C+3) feeds a Dense stack = batched MXU
matmuls; XLA fuses the gather + concat + first matmul, and the Pallas fused kernel
(ptt_tpu.ops.pallas) removes the HBM round-trip entirely for the hot configs.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .. import ops
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

        grouped, _, _ = ops.query_and_group(
            self.radius,
            self.nsample,
            xyz,
            new_xyz,
            features,
            use_xyz=self.use_xyz,
            normalize_xyz=self.normalize_xyz,
        )  # (B, npoint, nsample, C[+3])

        mlp_spec = list(self.mlp_channels)
        if self.use_xyz:
            mlp_spec[0] += 3
        new_features = SharedMLP(mlp_spec, bn=self.bn)(grouped, train=train)
        new_features = jnp.max(new_features, axis=2)  # max over the neighborhood
        return new_xyz, new_features, inds

"""PointNet++ Siamese backbone (reference PointNet2BackboneLight,
ptt/models/backbones_3d/pointnet2_backbone.py:8-67).

Three SA stages with shared weights applied to both the search branch
(1024 -> 512/256/128 points) and the template branch (512 -> 256/128/64), followed by
a final pointwise projection.  The returned ``inds`` compose the per-stage sample
indices back to the raw input ordering (gather-of-gather, reference :46-48) so
training labels can be gathered at seed positions.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .. import ops
from .sa_module import PointnetSAModule


class PointNet2BackboneLight(nn.Module):
    model_cfg: dict
    input_channels: int = 3

    def setup(self):
        sa_cfg = self.model_cfg["SA_CONFIG"]
        feat_channels = self.input_channels - 3  # xyz are consumed separately
        stages = []
        for k in range(len(sa_cfg["RADIUS"])):
            mlps = list(sa_cfg["MLPS"][k])
            mlps[0] = feat_channels if k == 0 else mlps[0]
            stages.append(
                PointnetSAModule(
                    mlp_channels=tuple(mlps),
                    radius=float(sa_cfg["RADIUS"][k]),
                    nsample=int(sa_cfg["NSAMPLE"][k]),
                    use_xyz=bool(sa_cfg.get("USE_XYZ", True)),
                    normalize_xyz=bool(sa_cfg.get("NORMALIZE_XYZ", True)),
                    sample_method=sa_cfg["SAMPLE_METHOD"][k],
                )
            )
        self.sa_stages = stages
        self.cov_final = nn.Dense(256)
        self.num_point_features = sa_cfg["MLPS"][-1][-1]

    def _branch(self, points, npoints, train, inds0=None):
        """One Siamese branch: 3 SA stages + final projection + index composition.
        ``inds0`` optionally supplies precomputed stage-0 sample indices (the fused
        Siamese FPS below)."""
        xyz = points[..., 0:3]
        features = points[..., 3:] if points.shape[-1] > 3 else None

        inds_list = []
        for k, (stage, npoint) in enumerate(zip(self.sa_stages, npoints)):
            xyz, features, inds = stage(
                xyz, features, npoint=int(npoint), train=train,
                inds=inds0 if k == 0 else None,
            )
            inds_list.append(inds)

        point_features = self.cov_final(features)
        inds = inds_list[0]
        for nxt in inds_list[1:]:
            inds = jnp.take_along_axis(inds, nxt, axis=1)
        return xyz, point_features, inds

    def __call__(self, batch, train: bool = False):
        sa_cfg = self.model_cfg["SA_CONFIG"]
        out = dict(batch)

        # Fused Siamese FPS: stage-0 sampling of both branches in one kernel call —
        # FPS rounds vectorize over rows, so the template's (fewer) rounds ride the
        # search call for free instead of a second sequential pass.
        inds0_s = inds0_t = None
        if sa_cfg["SAMPLE_METHOD"][0] == "fps":
            inds0_s, inds0_t = ops.furthest_point_sample_pair(
                batch["search_points"][..., 0:3], int(sa_cfg["NPOINTS_SEARCH"][0]),
                batch["template_points"][..., 0:3], int(sa_cfg["NPOINTS_TEMPLATE"][0]),
            )
        (
            out["search_seeds"],
            out["search_feats"],
            out["search_inds"],
        ) = self._branch(batch["search_points"], sa_cfg["NPOINTS_SEARCH"], train,
                         inds0=inds0_s)
        (
            out["template_seeds"],
            out["template_feats"],
            out["template_inds"],
        ) = self._branch(batch["template_points"], sa_cfg["NPOINTS_TEMPLATE"], train,
                         inds0=inds0_t)
        out.pop("search_points")
        out.pop("template_points")
        return out

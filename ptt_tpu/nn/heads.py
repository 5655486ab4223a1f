"""VoteNet-style voting heads (reference centroids_voting_head.py / box_voting_head.py).

Forward passes only — losses live in ``ptt_tpu.nn.losses`` as pure functions on the
output dict, keeping the modules side-effect free (the reference stashes
``forward_ret_dict`` state on the module instead).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvStack
from .sa_module import PointnetSAModule
from .transformer import build_transformer


class CentroidVotingHead(nn.Module):
    """Per-seed objectness + centroid vote regression
    (reference centroids_voting_head.py:9-113).

    Adds to the batch dict:
      pred_centroids_cls   (B, n)      objectness logits per seed
      pred_centroids_votes (B, n, 3)   voted centroid coordinates
      votes_feats          (B, n, 257) [sigmoid(cls) | voted features]
    """

    model_cfg: dict

    @nn.compact
    def __call__(self, batch, train: bool = False):
        out = dict(batch)
        seeds_xyz = batch["search_seeds"]  # (B, n, 3)
        fusion_feats = batch["cosine_feats"]  # (B, n, C)

        tb_cfg = self.model_cfg["TRANSFORMER_BLOCK"]
        if tb_cfg["ENABLE"]:
            fusion_feats, _ = build_transformer(tb_cfg, name="transformer_block")(
                seeds_xyz, fusion_feats, train=train
            )

        cls_use_xyz = bool(self.model_cfg.get("CLS_USE_SEARCH_XYZ", False))
        if cls_use_xyz:
            fusion_feats = jnp.concatenate([seeds_xyz, fusion_feats], axis=-1)
            cls_logits = ConvStack(self.model_cfg["CLS_FC"]["CHANNELS"])(
                fusion_feats, train=train
            )[..., 0]
            voting_input = fusion_feats
        else:
            cls_logits = ConvStack(self.model_cfg["CLS_FC"]["CHANNELS"])(
                fusion_feats, train=train
            )[..., 0]
            voting_input = jnp.concatenate([seeds_xyz, fusion_feats], axis=-1)

        voting_output = ConvStack(self.model_cfg["REG_FC"]["CHANNELS"])(voting_input, train=train)
        voting_results = voting_input + voting_output  # residual vote (B, n, 259)

        out["pred_centroids_cls"] = cls_logits
        out["pred_centroids_votes"] = voting_results[..., 0:3]
        out["votes_feats"] = jnp.concatenate(
            [nn.sigmoid(cls_logits)[..., None], voting_results[..., 3:]], axis=-1
        )
        return out


class BoxVotingHead(nn.Module):
    """Vote aggregation (one more SA stage over votes) + proposal refinement
    (reference box_voting_head.py:10-118).

    Adds to the batch dict:
      pred_box_center (B, np, 3)  cluster centers
      pred_box_data   (B, np, 5)  [cx, cy, cz, theta_deg, score_logit]
    """

    model_cfg: dict

    @nn.compact
    def __call__(self, batch, train: bool = False):
        out = dict(batch)
        sa_cfg = self.model_cfg["SA_CONFIG"]

        centers, proposal_feats, _ = PointnetSAModule(
            mlp_channels=tuple(sa_cfg["MLPS"]),
            radius=float(sa_cfg["RADIUS"]),
            nsample=int(sa_cfg["NSAMPLE"]),
            use_xyz=bool(sa_cfg.get("USE_XYZ", True)),
            normalize_xyz=bool(sa_cfg.get("NORMALIZE_XYZ", True)),
            sample_method=sa_cfg["SAMPLE_METHOD"],
            name="vote_aggregation",
        )(
            batch["pred_centroids_votes"],
            batch["votes_feats"],
            npoint=int(sa_cfg["NPOINTS"]),
            train=train,
        )

        tb_cfg = self.model_cfg["TRANSFORMER_BLOCK"]
        if tb_cfg["ENABLE"]:
            proposal_feats, _ = build_transformer(tb_cfg, name="transformer_block")(
                centers, proposal_feats, train=train
            )

        offsets = ConvStack(self.model_cfg["FC"])(proposal_feats, train=train)  # (B, np, 5)
        boxes = jnp.concatenate([offsets[..., 0:3] + centers, offsets[..., 3:]], axis=-1)

        out["pred_box_center"] = centers
        out["pred_box_data"] = boxes
        return out

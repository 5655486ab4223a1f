"""Top-level tracker: config-driven module pipeline (reference trackers/ptt.py:15-60
and tracker3d_template.py:19 module_topology).

``PTT.__call__`` threads a flat batch dict through
backbone -> similarity -> centroid head -> box head, exactly the reference topology.
The P2B baseline is the same network with transformers disabled via config
(reference cfgs/kitti_models/p2b.yaml).

Pure function semantics: ``model.apply(variables, batch, train=...)`` returns the
output dict; losses are computed separately by ``ptt_tpu.nn.losses.compute_losses``.
"""

from __future__ import annotations

from flax import linen as nn

from .backbone import PointNet2BackboneLight
from .heads import BoxVotingHead, CentroidVotingHead
from .similarity import CosineSimAug

ALL_BACKBONES = {"PointNet2BackboneLight": PointNet2BackboneLight}
ALL_SIMILARITY = {"CosineSimAug": CosineSimAug}
ALL_CENTROID_HEADS = {"CentroidVotingHead": CentroidVotingHead}
ALL_BOX_HEADS = {"BoxVotingHead": BoxVotingHead}


class PTT(nn.Module):
    """batch in:  search_points (B, 1024, 3), template_points (B, 512, 3)
    batch out: seeds/feats/inds per branch, cosine_feats, centroid votes + cls,
               box proposals (B, 64, 5) = [cx, cy, cz, theta_deg, score_logit]."""

    model_cfg: dict
    input_channels: int = 3

    @nn.compact
    def __call__(self, batch, train: bool = False):
        cfg = self.model_cfg
        out = ALL_BACKBONES[cfg["BACKBONE_3D"]["NAME"]](
            cfg["BACKBONE_3D"], input_channels=self.input_channels, name="backbone_3d"
        )(batch, train=train)
        out = ALL_SIMILARITY[cfg["SIMILARITY_MODULE"]["NAME"]](
            cfg["SIMILARITY_MODULE"], name="similarity_module"
        )(out, train=train)
        out = ALL_CENTROID_HEADS[cfg["CENTROID_HEAD"]["NAME"]](
            cfg["CENTROID_HEAD"], name="centroid_voting_head"
        )(out, train=train)
        out = ALL_BOX_HEADS[cfg["BOX_HEAD"]["NAME"]](
            cfg["BOX_HEAD"], name="box_voting_head"
        )(out, train=train)
        return out


ALL_TRACKERS = {"PTT": PTT, "P2B": PTT}


def build_network(model_cfg, input_channels: int = 3):
    """Reference build_network (ptt/models/__init__.py:9): tracker class from
    MODEL.NAME. P2B shares the PTT graph — the difference is pure config."""
    return ALL_TRACKERS[model_cfg["NAME"]](model_cfg=model_cfg, input_channels=input_channels)

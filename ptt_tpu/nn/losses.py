"""Training losses as pure functions of (model outputs, batch labels).

Reproduces the reference loss formulation exactly:
  - centroid head (centroids_voting_head.py:29-62): BCE-with-logits over all seeds
    (pos_weight, mean) + smooth-L1 vote regression toward the GT center, masked by the
    per-seed in-box labels *gathered through the backbone's sample indices*
    (centroids_voting_head.py:105);
  - box head (box_voting_head.py:33-66, :96-111): objectness labels/mask from
    center-to-GT distance (<0.3 positive, 0.3..0.6 ignored), masked BCE
    (pos_weight 2.0) + masked smooth-L1 on [x, y, z, theta_deg].
"""

from __future__ import annotations

import jax.numpy as jnp


def bce_with_logits(logits, labels, pos_weight: float = 1.0):
    """Elementwise torch-style BCEWithLogitsLoss: max(x,0) - x*z + log(1+exp(-|x|)),
    with positives weighted by ``pos_weight``."""
    log_sig = -jnp.logaddexp(0.0, -logits)  # log(sigmoid(x)), stable
    log_one_minus = -jnp.logaddexp(0.0, logits)  # log(1 - sigmoid(x)), stable
    return -(pos_weight * labels * log_sig + (1.0 - labels) * log_one_minus)


def smooth_l1(pred, target, beta: float = 1.0):
    """Elementwise torch SmoothL1Loss (beta=1)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def centroid_head_losses(outputs, batch, loss_cfg):
    w = loss_cfg["LOSS_WEIGHTS"]
    pos_weight = float(loss_cfg.get("CLS_LOSS_POS_WEIGHT", 1.0))

    # per-seed labels: gather the raw per-point labels at the backbone sample indices
    cls_label = jnp.take_along_axis(batch["cls_label"], outputs["search_inds"], axis=1)
    cls_pred = outputs["pred_centroids_cls"]  # (B, n) logits

    cls_loss = jnp.mean(bce_with_logits(cls_pred, cls_label, pos_weight))

    reg_pred = outputs["pred_centroids_votes"]  # (B, n, 3)
    reg_target = batch["reg_label"][:, None, :3]  # (B, 1, 3)
    reg_elem = smooth_l1(reg_pred, jnp.broadcast_to(reg_target, reg_pred.shape))
    reg_per_seed = jnp.mean(reg_elem, axis=2)  # (B, n)
    reg_loss = jnp.sum(reg_per_seed * cls_label) / (jnp.sum(cls_label) + 1e-6)

    tb = {"centroids_cls_loss": cls_loss, "centroids_reg_loss": reg_loss}
    total = cls_loss * w["centroids_cls_weight"] + reg_loss * w["centroids_reg_weight"]
    return total, tb


def box_head_losses(outputs, batch, loss_cfg):
    w = loss_cfg["LOSS_WEIGHTS"]
    pos_weight = float(loss_cfg.get("CLS_LOSS_POS_WEIGHT", 1.0))

    centers = outputs["pred_box_center"]  # (B, np, 3)
    gt_center = batch["reg_label"][:, None, 0:3]
    dist = jnp.sqrt(jnp.sum((centers - gt_center) ** 2, axis=-1) + 1e-6)  # (B, np)
    objectness_label = (dist < 0.3).astype(jnp.float32)
    objectness_mask = ((dist < 0.3) | (dist > 0.6)).astype(jnp.float32)

    box_data = outputs["pred_box_data"]  # (B, np, 5)
    cls_pred = box_data[..., -1]
    cls_elem = bce_with_logits(cls_pred, objectness_label, pos_weight)
    cls_loss = jnp.sum(cls_elem * objectness_mask) / (jnp.sum(objectness_mask) + 1e-6)

    reg_pred = box_data[..., :-1]  # (B, np, 4)
    reg_target = jnp.broadcast_to(batch["reg_label"][:, None, :], reg_pred.shape)
    reg_elem = smooth_l1(reg_pred, reg_target)
    reg_per_prop = jnp.mean(reg_elem, axis=2)
    reg_loss = jnp.sum(reg_per_prop * objectness_label) / (jnp.sum(objectness_label) + 1e-6)

    tb = {"boxes_cls_loss": cls_loss, "boxes_reg_loss": reg_loss}
    total = cls_loss * w["boxes_cls_weight"] + reg_loss * w["boxes_reg_weight"]
    return total, tb


def compute_losses(model_cfg, outputs, batch):
    """Total training loss = centroid head + box head (reference ptt.py:53-60)."""
    centroid_loss, tb1 = centroid_head_losses(
        outputs, batch, model_cfg["CENTROID_HEAD"]["LOSS_CONFIG"]
    )
    box_loss, tb2 = box_head_losses(outputs, batch, model_cfg["BOX_HEAD"]["LOSS_CONFIG"])
    tb = {**tb1, **tb2}
    loss = centroid_loss + box_loss
    tb["loss"] = loss
    return loss, tb

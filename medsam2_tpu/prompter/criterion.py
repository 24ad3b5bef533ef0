"""Joint prompter+SAM training criterion (rebuild of
``sam2_train/modeling/criterion.py``).

Losses, given Hungarian assignments (padded, fixed-shape):
- ``loss_reg``: L2 on matched point coords, summed / num_points   (x20)
- ``loss_cls``: cross-entropy over all queries with eos background
  weight on the no-object class                                    (x20)
- ``loss_mask``: binary focal on the prompter's semantic mask      (x20)
- ``loss_focal``: Dice on the combined SAM instance mask  (the reference's
  names are swapped — its ``loss_focal`` computes Dice and ``loss_dice``
  computes focal, ``criterion.py:136-137``; we keep the math, sane names)
- ``loss_dice``: focal on the SAM instance mask
- ``loss_iou``: MSE between predicted IoU and actual mask IoU (MaskIoULoss)

The focal and dice terms replicate ``pytorch_toolbelt`` at the reference's
construction defaults (``criterion.py:41-42``): ``BinaryFocalLoss()`` has
**alpha=None** (no alpha weighting, unlike torchvision's 0.25) and
``DiceLoss('binary')`` pools ONE dice score over batch+spatial with
smooth=0 — see :func:`medsam2_tpu.train.losses.binary_focal_loss` /
:func:`~medsam2_tpu.train.losses.dice_loss_pooled`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from medsam2_tpu.train.losses import binary_focal_loss, dice_loss_pooled


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 1
    eos_coef: float = 0.3
    reg_loss_coef: float = 20.0
    cls_loss_coef: float = 20.0
    mask_loss_coef: float = 20.0
    loss_focal: float = 1.0   # weight on the Dice term (reference naming)
    loss_dice: float = 1.0    # weight on the focal term
    loss_iou: float = 1.0


def loss_reg(pred_coords, gt_points, src_idx, gt_valid, num_points):
    """L2 on matched points (``criterion.py:48-61``)."""
    idx = jnp.maximum(src_idx, 0)
    matched = jnp.take_along_axis(pred_coords, idx[..., None], axis=1)
    err = jnp.sum((matched - gt_points) ** 2, axis=-1)
    err = jnp.where(gt_valid, err, 0.0)
    return jnp.sum(err) / (num_points + 1e-7)


def loss_cls(pred_logits, gt_labels, src_idx, gt_valid, ccfg: CriterionConfig):
    """CE over all queries; unmatched queries target the background class with
    ``eos_coef`` weight (``criterion.py:63-75``)."""
    B, N, C1 = pred_logits.shape
    bg = ccfg.num_classes
    targets = jnp.full((B, N), bg, jnp.int32)
    # Scatter matched labels; padded GT slots (src_idx == -1) are routed to the
    # out-of-bounds index N and dropped, so they can never alias query 0.
    idx = jnp.where(gt_valid & (src_idx >= 0), src_idx, N)
    targets = jax.vmap(lambda t, i, u: t.at[i].set(u, mode="drop"))(
        targets, idx, gt_labels.astype(jnp.int32))
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    weight = jnp.where(targets == bg, ccfg.eos_coef, 1.0)
    return jnp.sum(nll * weight) / jnp.maximum(jnp.sum(weight), 1e-7)


def mask_iou_loss(pred_mask, gt_mask, pred_iou):
    """MaskIoULoss (``criterion.py:11-29``): MSE between predicted IoU and the
    soft IoU of the sigmoid mask."""
    p = jax.nn.sigmoid(pred_mask.astype(jnp.float32))
    inter = jnp.sum(p * gt_mask, axis=(1, 2))
    union = jnp.sum(p, axis=(1, 2)) + jnp.sum(gt_mask, axis=(1, 2)) - inter
    iou = (inter + 1e-7) / (union + 1e-7)
    return jnp.mean((iou - pred_iou) ** 2)


def criterion_losses(
    ccfg: CriterionConfig,
    outputs: Dict,          # prompter outputs: pred_coords/pred_logits/pred_masks
    gt_points, gt_labels, gt_valid,   # [B, M, 2], [B, M], [B, M]
    gt_semantic_mask,       # [B, H, W] binary
    src_idx,                # [B, M] Hungarian assignment (-1 pad)
    sam_pred,               # [B, H, W] combined SAM instance logits
    sam_iou,                # [B] predicted IoU
    sam_gt,                 # [B, H, W] instance gt (binary)
) -> Dict[str, jnp.ndarray]:
    num_points = jnp.maximum(jnp.sum(gt_valid.astype(jnp.float32)), 1.0)
    losses = {
        "loss_reg": loss_reg(outputs["pred_coords"], gt_points, src_idx,
                             gt_valid, num_points) * ccfg.reg_loss_coef,
        "loss_cls": loss_cls(outputs["pred_logits"], gt_labels, src_idx,
                             gt_valid, ccfg) * ccfg.cls_loss_coef,
        "loss_mask": binary_focal_loss(
            outputs["pred_masks"], gt_semantic_mask) * ccfg.mask_loss_coef,
        "loss_focal": dice_loss_pooled(sam_pred, sam_gt) * ccfg.loss_focal,
        "loss_dice": binary_focal_loss(sam_pred, sam_gt) * ccfg.loss_dice,
        "loss_iou": mask_iou_loss(sam_pred, sam_gt, sam_iou) * ccfg.loss_iou,
    }
    return losses

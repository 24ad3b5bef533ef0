"""Training losses (rebuilds of the reference loss functions)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise ``BCEWithLogitsLoss`` with ``pos_weight`` (the 3D recipe uses
    pos_weight=2, ``func_3d/function.py:35-36``). Mean over all elements."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    return loss


def dice_loss(logits, targets, eps: float = 1e-5):
    """Soft Dice on sigmoid probabilities, per sample; mean over batch."""
    probs = jax.nn.sigmoid(logits)
    p = probs.reshape(probs.shape[0], -1)
    t = targets.reshape(targets.shape[0], -1)
    inter = jnp.sum(p * t, axis=1)
    denom = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)
    return 1.0 - (2.0 * inter + eps) / (denom + eps)


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Elementwise binary focal loss (used by the 2D criterion)."""
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def iou_between(pred_mask, gt_mask, eps: float = 1e-6):
    """Binary IoU per sample over flattened masks."""
    p = pred_mask.reshape(pred_mask.shape[0], -1).astype(jnp.float32)
    g = gt_mask.reshape(gt_mask.shape[0], -1).astype(jnp.float32)
    inter = jnp.sum(p * g, axis=1)
    union = jnp.sum(jnp.maximum(p, g), axis=1)
    return inter / (union + eps)

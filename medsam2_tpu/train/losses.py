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


def binary_focal_loss(logits, targets, gamma: float = 2.0):
    """``pytorch_toolbelt.losses.BinaryFocalLoss()`` exactly as the reference
    criterion constructs it (``sam2_train/modeling/criterion.py:41``): the
    class default is **alpha=None** — no alpha weighting (unlike
    torchvision's 0.25 convention) — gamma=2, mean reduction.
    loss = (1 - pt)^gamma * BCE, pt = exp(-BCE)."""
    ce = bce_with_logits(logits.astype(jnp.float32), targets.astype(jnp.float32))
    pt = jnp.exp(-ce)
    return jnp.mean((1.0 - pt) ** gamma * ce)


def dice_loss_pooled(logits, targets, eps: float = 1e-7):
    """``pytorch_toolbelt.losses.DiceLoss('binary')`` exactly as constructed
    at ``criterion.py:42``: sigmoid probabilities, ONE soft-dice score pooled
    over batch AND spatial dims (dims=(0, 2) of the [bs, 1, -1] view — not a
    per-sample mean), smooth=0.0, ``clamp_min(eps)`` on the denominator, and
    the loss is zeroed when the batch ground truth is empty."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    inter = jnp.sum(p * t)
    card = jnp.sum(p) + jnp.sum(t)
    score = 2.0 * inter / jnp.maximum(card, eps)
    return jnp.where(jnp.sum(t) > 0, 1.0 - score, 0.0)


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

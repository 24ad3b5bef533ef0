"""DETR-style Hungarian matcher (rebuild of ``sam2_train/modeling/matcher.py``).

Cost = cost_point * ||pred - gt||_2 + cost_class * (-softmax prob of gt class)
solved with ``scipy.optimize.linear_sum_assignment``. On TPU the assignment
runs as a host callback (``jax.pure_callback``) with fixed-shape padded
outputs — matching is int-valued and carries no gradient, so the callback is
transparent to autodiff.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    cost_point: float = 0.1
    cost_class: float = 1.0


def _match_host(cost: np.ndarray, gt_valid: np.ndarray) -> np.ndarray:
    """cost [B, N, M]; gt_valid [B, M] bool -> src indices [B, M] int32
    (-1 for padding slots)."""
    from scipy.optimize import linear_sum_assignment

    B, N, M = cost.shape
    out = -np.ones((B, M), np.int32)
    for b in range(B):
        valid_cols = np.flatnonzero(gt_valid[b])
        if valid_cols.size == 0:
            continue
        rows, cols = linear_sum_assignment(cost[b][:, valid_cols])
        out[b, valid_cols[cols]] = rows.astype(np.int32)
    return out


def hungarian_match_host(mcfg: MatcherConfig, pred_coords: np.ndarray,
                         pred_logits: np.ndarray, gt_points: np.ndarray,
                         gt_labels: np.ndarray, gt_valid: np.ndarray) -> np.ndarray:
    """Pure-numpy exact matching for backends without jit host callbacks
    (the axon PJRT plugin rejects pure_callback). Same cost and assignment as
    :func:`hungarian_match`; run it between two jitted calls."""
    pred_coords = np.asarray(pred_coords, np.float64)
    pred_logits = np.asarray(pred_logits, np.float64)
    gt_points = np.asarray(gt_points, np.float64)
    gt_labels = np.asarray(gt_labels)
    gt_valid = np.asarray(gt_valid, bool)
    B, N, _ = pred_coords.shape
    M = gt_points.shape[1]
    cost_point = np.linalg.norm(
        pred_coords[:, :, None, :] - gt_points[:, None, :, :], axis=-1)
    z = pred_logits - pred_logits.max(-1, keepdims=True)
    prob = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    lbl = np.clip(gt_labels, 0, prob.shape[-1] - 1)
    cost_class = -np.take_along_axis(
        prob, np.broadcast_to(lbl[:, None, :], (B, N, M)), axis=-1)
    cost = mcfg.cost_point * cost_point + mcfg.cost_class * cost_class
    cost = np.where(gt_valid[:, None, :], cost, 1e9)
    out = _match_host(cost, gt_valid)
    return np.where(gt_valid, out, -1).astype(np.int32)


def backend_supports_callbacks() -> bool:
    """Whether jit host callbacks work on the current backend (the axon TPU
    tunnel raises UNIMPLEMENTED for pure_callback)."""
    import jax

    try:
        f = jax.jit(lambda x: jax.pure_callback(
            lambda a: a + 1, jax.ShapeDtypeStruct((), jnp.int32), x))
        return int(f(jnp.int32(1))) == 2
    except Exception:
        return False


def hungarian_match(mcfg: MatcherConfig, pred_coords: jnp.ndarray,
                    pred_logits: jnp.ndarray, gt_points: jnp.ndarray,
                    gt_labels: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """pred_coords [B, N, 2]; pred_logits [B, N, C+1]; gt_points [B, M, 2];
    gt_labels [B, M]; gt_valid [B, M]. Returns src indices [B, M] (-1 pad).

    Reproduces ``HungarianMatcher.forward`` (``matcher.py:29-47``); padded GT
    slots get a huge cost so they never steal predictions.
    """
    B, N, _ = pred_coords.shape
    M = gt_points.shape[1]
    cost_point = jnp.linalg.norm(
        pred_coords[:, :, None, :].astype(jnp.float32)
        - gt_points[:, None, :, :].astype(jnp.float32), axis=-1)
    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    lbl = jnp.clip(gt_labels, 0, prob.shape[-1] - 1)
    cost_class = -jnp.take_along_axis(
        prob, jnp.broadcast_to(lbl[:, None, :], (B, N, M)), axis=-1)
    cost = mcfg.cost_point * cost_point + mcfg.cost_class * cost_class
    cost = jnp.where(gt_valid[:, None, :], cost, 1e9)
    cost = jax.lax.stop_gradient(cost)

    result = jax.pure_callback(
        _match_host,
        jax.ShapeDtypeStruct((B, M), jnp.int32),
        cost, gt_valid,
        vmap_method="sequential",
    )
    return jnp.where(gt_valid, result, -1)

"""Non-maximum suppression — replaces torchvision's C++/CUDA ``batched_nms``
(used by AMG at ``automatic_mask_generator.py:223,261`` and the 2D eval merge
at ``func_2d/function.py:614,749,807``).

Two implementations: a pure-numpy greedy NMS for host-side eval paths, and a
fixed-shape ``lax.fori_loop`` version for in-graph use.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _iou_matrix_np(boxes: np.ndarray) -> np.ndarray:
    x0 = np.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y0 = np.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x1 = np.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y1 = np.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = area[:, None] + area[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def nms_np(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Greedy NMS; returns kept indices sorted by descending score (matches
    torchvision.ops.nms semantics). Uses the native C++ kernel when built."""
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    from medsam2_tpu import native
    kept = native.greedy_nms(boxes, scores, iou_threshold)
    if kept is not None:
        return kept
    order = np.argsort(-scores, kind="stable")
    iou = _iou_matrix_np(boxes)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > iou_threshold
        suppressed[i] = True
    return np.asarray(keep, np.int64)


def batched_nms_np(boxes: np.ndarray, scores: np.ndarray, idxs: np.ndarray,
                   iou_threshold: float) -> np.ndarray:
    """Category-aware NMS via the coordinate-offset trick (torchvision's
    batched_nms)."""
    boxes = np.asarray(boxes, np.float32)
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    max_coord = boxes.max() + 1
    offsets = np.asarray(idxs, np.float32) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_np(shifted, scores, iou_threshold)


@jax.jit
def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    x0 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y0 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x1 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y1 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.clip(x1 - x0, 0) * jnp.clip(y1 - y0, 0)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_jax(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
            valid: jnp.ndarray = None) -> jnp.ndarray:
    """In-graph greedy NMS over fixed-size [N, 4] boxes.

    Returns a keep mask [N] bool. ``valid`` masks padding rows."""
    N = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((N,), bool)
    iou = _iou_matrix(boxes)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))

    def body(i, state):
        keep, suppressed = state
        idx = order[i]
        ok = valid[idx] & ~suppressed[idx]
        keep = keep.at[idx].set(ok)
        sup_new = suppressed | (ok & (iou[idx] > iou_threshold))
        sup_new = sup_new.at[idx].set(suppressed[idx])
        return keep, sup_new

    keep, _ = jax.lax.fori_loop(
        0, N, body, (jnp.zeros((N,), bool), jnp.zeros((N,), bool)))
    return keep


def point_nms_np(points: np.ndarray, scores: np.ndarray, dist_threshold: float) -> np.ndarray:
    """Greedy distance-based point NMS (``modeling/utils.py:342-355``).
    Returns kept indices by descending score."""
    points = np.asarray(points, np.float32)
    if len(points) == 0:
        return np.zeros((0,), np.int64)
    from medsam2_tpu import native
    kept = native.point_nms(points, np.asarray(scores, np.float32), dist_threshold)
    if kept is not None:
        return kept
    order = np.argsort(-np.asarray(scores, np.float32), kind="stable")
    dists = np.linalg.norm(points[:, None] - points[None, :], axis=-1)
    keep = []
    suppressed = np.zeros(len(points), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= dists[i] < dist_threshold
        suppressed[i] = True
    return np.asarray(keep, np.int64)

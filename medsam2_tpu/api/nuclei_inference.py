"""Nuclei instance inference: sliding-window crops -> prompter points -> SAM
per-cell decode -> NMS merge -> instance map (rebuild of the reference's 2D val
engine, ``func_2d/function.py:268-678`` and ``crop_with_overlap`` ``:872-907``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config
from medsam2_tpu.core import layers, sam2_model
from medsam2_tpu.ops.nms import batched_nms_np, point_nms_np
from medsam2_tpu.postproc.amg_utils import batched_mask_to_box, calculate_stability_score
from medsam2_tpu.prompter.dpa_p2pnet import prompter_apply
from medsam2_tpu.train.recipe_2d import encode_and_condition


def crop_with_overlap(h: int, w: int, crop_size: int, overlap: int) -> List[Tuple[int, int]]:
    """Top-left corners of overlapping crops covering [0,h)x[0,w)
    (``func_2d/function.py:872-907`` semantics)."""
    stride = max(crop_size - overlap, 1)
    xs = list(range(0, max(w - crop_size, 0) + 1, stride)) or [0]
    ys = list(range(0, max(h - crop_size, 0) + 1, stride)) or [0]
    if xs[-1] + crop_size < w:
        xs.append(w - crop_size)
    if ys[-1] + crop_size < h:
        ys.append(h - crop_size)
    return [(x, y) for y in ys for x in xs]


def predict_points(params, rcfg, image: jnp.ndarray,
                   score_thresh: float = 0.5,
                   semantic_feature: Optional[jnp.ndarray] = None):
    """Prompter inference wrapper (``modeling/utils.py:390-432``): foreground
    points with scores. Returns (points [K, 2], scores [K]) numpy."""
    outputs, _ = prompter_apply(params["prompter"], rcfg.prompter, image,
                                semantic_feature)
    logits = np.asarray(outputs["pred_logits"][0], np.float32)
    coords = np.asarray(outputs["pred_coords"][0], np.float32)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    fg_score = probs[:, :-1].sum(-1)
    cls = probs.argmax(-1)
    keep = (cls < probs.shape[-1] - 1) & (fg_score > score_thresh)
    # clip into the image
    S = image.shape[1]
    coords = np.clip(coords, 0, S - 1)
    return coords[keep], fg_score[keep]


def decode_cells(params, cfg: SAM2Config, points: np.ndarray, bank, key,
                 image: jnp.ndarray, bank_nonempty: bool, max_batch: int = 64):
    """SAM decode of one mask per point. Returns (masks [K, S, S] logits,
    ious [K]) numpy."""
    S = cfg.image_size
    image_embed, high_res, _ = encode_and_condition(
        params["sam2"] if "sam2" in params else params, cfg, image, bank, key,
        bank_nonempty, 1)
    sam_params = params["sam2"] if "sam2" in params else params
    image_pe = sam2_model.prompt_encoder.get_dense_pe(
        sam_params["sam_prompt_encoder"], cfg)

    all_masks, all_ious = [], []
    for start in range(0, len(points), max_batch):
        chunk = points[start:start + max_batch]
        k = len(chunk)
        pad = max_batch - k
        coords = jnp.asarray(
            np.pad(chunk, ((0, pad), (0, 0)))[:, None, :], jnp.float32)
        labels = jnp.asarray(
            np.pad(np.ones(k, np.int32), (0, pad), constant_values=-1)[:, None])
        sparse, dense = sam2_model.prompt_encoder.prompt_encoder_apply(
            sam_params["sam_prompt_encoder"], cfg, points=(coords, labels))
        idx = jnp.zeros((max_batch,), jnp.int32)
        low_res, ious, _, _ = sam2_model.mask_decoder.mask_decoder_apply(
            sam_params["sam_mask_decoder"], cfg, image_embed, image_pe,
            sparse, dense, multimask_output=False, high_res_features=high_res,
            image_indices=idx)
        up = layers.interpolate(
            low_res.astype(jnp.float32).transpose(0, 2, 3, 1), (S, S),
            method="bilinear")[..., 0]
        all_masks.append(np.asarray(up)[:k])
        all_ious.append(np.asarray(ious)[:k, 0])
    if not all_masks:
        return np.zeros((0, S, S), np.float32), np.zeros((0,), np.float32)
    return np.concatenate(all_masks), np.concatenate(all_ious)


def predict_instances(params, cfg: SAM2Config, rcfg, sample: Dict, bank, key,
                      crop_size: Optional[int] = None, overlap: int = 64,
                      point_nms_dist: float = 12.0, mask_nms_thresh: float = 0.6,
                      min_area: int = 4) -> np.ndarray:
    """Full-image nuclei instance prediction -> int32 instance map.

    Mirrors the reference two-stage merge: per-crop prompter points -> global
    point NMS -> per-point SAM masks scored by iou*stability -> cross-crop box
    NMS -> paint instances by descending score (``func_2d/function.py:584-624``).
    """
    img = np.asarray(sample["image"], np.float32)
    H, W = img.shape[:2]
    crop_size = crop_size or cfg.image_size

    all_points: List[np.ndarray] = []
    all_scores: List[np.ndarray] = []
    crop_of_point: List[int] = []
    crops = crop_with_overlap(H, W, crop_size, overlap)
    crop_images = []
    for ci, (x0, y0) in enumerate(crops):
        crop = img[y0:y0 + crop_size, x0:x0 + crop_size]
        crop_images.append((x0, y0, crop))
        pts, scores = predict_points(params, rcfg, jnp.asarray(crop[None]))
        if len(pts) == 0:
            continue
        gpts = pts + np.array([x0, y0], np.float32)
        all_points.append(gpts)
        all_scores.append(scores)
        crop_of_point.extend([ci] * len(gpts))

    if not all_points:
        return np.zeros((H, W), np.int32)
    points = np.concatenate(all_points)
    scores = np.concatenate(all_scores)
    crop_idx = np.asarray(crop_of_point)
    keep = point_nms_np(points, scores, point_nms_dist)
    points, scores, crop_idx = points[keep], scores[keep], crop_idx[keep]

    # per-crop SAM decode of the surviving points
    masks_g: List[np.ndarray] = []
    mask_scores: List[float] = []
    boxes: List[np.ndarray] = []
    for ci, (x0, y0, crop) in enumerate(crop_images):
        sel = crop_idx == ci
        if not sel.any():
            continue
        local = points[sel] - np.array([x0, y0], np.float32)
        key, sub = jax.random.split(key)
        logits, ious = decode_cells(params, cfg, local, bank, sub,
                                    jnp.asarray(crop[None]),
                                    bank_nonempty=bool(np.asarray(bank["valid"]).any()))
        stab = np.asarray(calculate_stability_score(logits, 0.0, 1.0))
        binm = logits > 0
        for k in range(len(local)):
            m = binm[k]
            if m.sum() < min_area:
                continue
            gm = np.zeros((H, W), bool)
            gm[y0:y0 + crop_size, x0:x0 + crop_size] = m
            masks_g.append(gm)
            mask_scores.append(float(ious[k] * stab[k]))
            boxes.append(batched_mask_to_box(gm[None])[0])

    if not masks_g:
        return np.zeros((H, W), np.int32)
    boxes_np = np.stack(boxes)
    scores_np = np.asarray(mask_scores, np.float32)
    keep = batched_nms_np(boxes_np, scores_np, np.zeros(len(boxes_np)),
                          mask_nms_thresh)

    inst_map = np.zeros((H, W), np.int32)
    next_id = 1
    for i in keep[np.argsort(-scores_np[keep], kind="stable")]:
        m = masks_g[i] & (inst_map == 0)
        if m.sum() < min_area:
            continue
        inst_map[m] = next_id
        next_id += 1
    return inst_map

"""Nuclei instance inference: sliding-window crops -> prompter points -> SAM
per-cell decode -> NMS merge -> instance map (rebuild of the reference's 2D val
engine, ``func_2d/function.py:268-678`` and ``crop_with_overlap`` ``:872-907``).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config
from medsam2_tpu.core import layers, sam2_model
from medsam2_tpu.ops.nms import batched_nms_np, point_nms_np
from medsam2_tpu.postproc.amg_utils import batched_mask_to_box
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


@functools.lru_cache(maxsize=8)
def _jit_prompter(pcfg):
    return jax.jit(lambda params, image, sem: prompter_apply(
        params, pcfg, image, sem)[0])


@functools.lru_cache(maxsize=8)
def _jit_encode(cfg: SAM2Config):
    def f(sam_params, image, bank, key, bank_nonempty):
        return encode_and_condition(sam_params, cfg, image, bank, key,
                                    bank_nonempty, 1)
    return jax.jit(f, static_argnames=("bank_nonempty",))


@functools.lru_cache(maxsize=8)
def _jit_chunk_decode(cfg: SAM2Config, max_batch: int, packed: bool = False):
    S = cfg.image_size

    def f(sam_params, image_embed, high_res, coords, labels):
        image_pe = sam2_model.prompt_encoder.get_dense_pe(
            sam_params["sam_prompt_encoder"], cfg)
        sparse, dense = sam2_model.prompt_encoder.prompt_encoder_apply(
            sam_params["sam_prompt_encoder"], cfg, points=(coords, labels))
        idx = jnp.zeros((max_batch,), jnp.int32)
        low_res, ious, _, _ = sam2_model.mask_decoder.mask_decoder_apply(
            sam_params["sam_mask_decoder"], cfg, image_embed, image_pe,
            sparse, dense, multimask_output=False,
            high_res_features=list(high_res), image_indices=idx,
            # eval-only path: the reference validates with net.eval() and the
            # build_sam2 stability-fallback override (func_2d/function.py:271)
            dynamic_multimask_via_stability=True)
        up = layers.interpolate(
            low_res.astype(jnp.float32).transpose(0, 2, 3, 1), (S, S),
            method="bilinear")[..., 0]
        if packed:
            # the instance pipeline only consumes `logits > 0` — pack the
            # thresholded masks on-device (uint8, 32x less tunnel transfer
            # than the fp32 logit stack; same trick as the AMG decode path,
            # automatic_mask_generator.py:336-350)
            return jnp.packbits(up > 0, axis=-1), ious[:, 0]
        return up, ious[:, 0]
    return jax.jit(f)


@functools.lru_cache(maxsize=8)
def _jit_bank_write(cfg: SAM2Config):
    from medsam2_tpu.state import similarity_bank as _sb

    def f(sam_params, top_feat, binary_nchw, bank, iou, embed_flat):
        # binarize=True: SAM2Base._encode_new_memory binarizes point-prompted
        # masks only at EVAL (`not self.training`, sam2_base.py:676-681) —
        # training applies sigmoid instead; whether binarize actually fires
        # is then cfg.binarize_mask_from_pts_for_mem_enc (the fork's 2D
        # build_sam2 leaves it False -> near-binary sigmoid(20m-10))
        maskmem, _ = sam2_model.encode_new_memory(
            sam_params, cfg, top_feat, binary_nchw, is_mask_from_pts=True,
            binarize=True)
        return _sb.write_similarity_bank(bank, maskmem, iou, embed_flat)
    return jax.jit(f)


def predict_points(params, rcfg, image: jnp.ndarray,
                   score_thresh: float = 0.5,
                   semantic_feature: Optional[jnp.ndarray] = None,
                   filtering: bool = False):
    """Prompter inference wrapper (``modeling/utils.py:390-432``): foreground
    points with scores. For a single foreground class the argmax-foreground
    rule equals ``fg_score > 0.5``, and the winning-class prob equals the
    summed foreground prob — both reference-exact. ``filtering`` additionally
    keeps only points whose pixel is positive in the prompter's semantic mask
    (``utils.py:423-427``). Returns (points [K, 2], scores [K]) numpy."""
    outputs = _jit_prompter(rcfg.prompter)(params["prompter"], image,
                                           semantic_feature)
    logits = np.asarray(outputs["pred_logits"][0], np.float32)
    coords = np.array(outputs["pred_coords"][0], np.float32)  # writable copy
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    fg_score = probs[:, :-1].sum(-1)
    cls = probs.argmax(-1)
    keep = (cls < probs.shape[-1] - 1) & (fg_score > score_thresh)
    # clip into the image (the reference clips x to W-1 / y to H-1 first)
    H, W = image.shape[1], image.shape[2]
    coords[:, 0] = np.clip(coords[:, 0], 0, W - 1)
    coords[:, 1] = np.clip(coords[:, 1], 0, H - 1)
    coords, scores = coords[keep], fg_score[keep]
    if filtering and len(coords):
        sem = np.asarray(outputs["pred_masks"][0], np.float32) > 0
        on_mask = sem[coords.astype(int)[:, 1], coords.astype(int)[:, 0]]
        coords, scores = coords[on_mask], scores[on_mask]
    return coords, scores


def decode_cells(params, cfg: SAM2Config, points: np.ndarray, bank, key,
                 image: jnp.ndarray, bank_nonempty: bool, max_batch: int = 64,
                 return_memory: bool = False, binary: bool = False):
    """SAM decode of one mask per point. Returns (masks [K, S, S] logits,
    ious [K]) numpy — plus (image_embed, vision_feats) when
    ``return_memory`` (for the eval-time similarity-bank write,
    ``function.py:511-565``).

    ``binary=True`` thresholds (``> 0``) and bit-packs the masks ON DEVICE
    and returns bool masks instead of logits — exact for every consumer of
    ``logits > 0`` while transferring 32x less over the device link."""
    S = cfg.image_size
    sam_params = params["sam2"] if "sam2" in params else params
    image_embed, high_res, vision_feats = _jit_encode(cfg)(
        sam_params, image, bank, key, bank_nonempty=bank_nonempty)
    chunk_fn = _jit_chunk_decode(cfg, max_batch, packed=binary)

    all_masks, all_ious = [], []
    for start in range(0, len(points), max_batch):
        chunk = points[start:start + max_batch]
        k = len(chunk)
        pad = max_batch - k
        coords = jnp.asarray(
            np.pad(chunk, ((0, pad), (0, 0)))[:, None, :], jnp.float32)
        # label 0 per point, matching the reference's validation exactly
        # (func_2d/function.py:416 hardcodes torch.zeros): the model is
        # trained with class-0 (negative-embedding) point prompts, so eval
        # must prompt the same way.
        labels = jnp.asarray(
            np.pad(np.zeros(k, np.int32), (0, pad), constant_values=-1)[:, None])
        up, ious = chunk_fn(sam_params, image_embed, tuple(high_res),
                            coords, labels)
        if binary:
            m = np.unpackbits(np.asarray(up), axis=-1, count=S)[:k].astype(bool)
        else:
            m = np.asarray(up)[:k]
        all_masks.append(m)
        all_ious.append(np.asarray(ious)[:k])
    if not all_masks:
        out = (np.zeros((0, S, S), bool if binary else np.float32),
               np.zeros((0,), np.float32))
    else:
        out = (np.concatenate(all_masks), np.concatenate(all_ious))
    if return_memory:
        return out + (image_embed, vision_feats)
    return out


def drop_points_in_processed_boxes(points: np.ndarray, processed_boxes) -> np.ndarray:
    """Boolean keep-mask dropping points strictly inside any previously
    processed crop box (interior test [x1+1, x2-1], ``function.py:365-372``):
    a point detected again in a later overlapping crop is discarded — the
    earlier crop owns it."""
    keep = np.ones(len(points), bool)
    for (px1, py1, px2, py2) in processed_boxes:
        keep &= ~((points[:, 0] >= px1 + 1) & (points[:, 0] <= px2 - 1)
                  & (points[:, 1] >= py1 + 1) & (points[:, 1] <= py2 - 1))
    return keep


def merge_instances(masks: List[np.ndarray], scores: np.ndarray,
                    boxes: np.ndarray, point_ids: np.ndarray,
                    hw: Tuple[int, int], mask_nms_thresh: float) -> np.ndarray:
    """The reference's two-stage cross-crop merge (``function.py:575-627``):

    1. per-point keep-best: a point decoded in several overlapping crops keeps
       only its highest-scoring instance (``keep_prior``),
    2. class-agnostic box NMS over the survivors,
    3. paint the instance map in *reversed* NMS order (ascending score, so
       higher-scoring masks overwrite): a mask is painted when ANY of its
       pixels is still uncovered (``b_inst_map[mask].all() == 0`` — note the
       reference paints the WHOLE mask then, overwriting the overlapped
       pixels of earlier instances), with the enumeration index as the
       instance id (ids of fully-covered masks are skipped, leaving gaps —
       exactly the reference numbering; ``remap_label`` normalizes).
    """
    scores = np.asarray(scores, np.float32)
    point_ids = np.asarray(point_ids)
    keep_prior = np.ones(len(point_ids), bool)
    uniq, counts = np.unique(point_ids, return_counts=True)
    for pid in uniq[counts > 1]:
        inds = np.where(point_ids == pid)[0]
        inds = np.delete(inds, np.argmax(scores[inds]))
        keep_prior[inds] = False

    kept = np.where(keep_prior)[0]
    if len(kept) == 0:
        return np.zeros(hw, np.int32)
    keep_by_nms = batched_nms_np(boxes[kept].astype(np.float32), scores[kept],
                                 np.zeros(len(kept)), mask_nms_thresh)
    order = kept[keep_by_nms][::-1]
    inst_map = np.zeros(hw, np.int32)
    for iid, ind in enumerate(order):
        m = masks[ind]
        if m.any() and (inst_map[m] == 0).any():
            inst_map[m] = iid + 1
    return inst_map


def predict_instances(params, cfg: SAM2Config, rcfg, sample: Dict, bank, key,
                      crop_size: Optional[int] = None, overlap: int = 64,
                      point_nms_dist: float = 12.0, mask_nms_thresh: float = 0.6,
                      min_area: int = 0, filtering: bool = False,
                      write_bank: bool = True) -> np.ndarray:
    """Full-image nuclei instance prediction -> int32 instance map.

    Follows the reference's sliding-window flow (``func_2d/function.py:330-627``):
    per-crop prompter points (optionally ``filtering`` by the prompter's
    semantic mask, ``cfgs.test.filtering``) -> drop points inside
    already-processed crops -> progressive point NMS over the accumulated
    set -> decode every surviving point in *each* crop containing it ->
    per-point keep-best instance -> cross-crop box NMS -> reverse-order paint
    (:func:`merge_instances`). Like the reference, each decoded crop also
    writes its union mask memory into the similarity ``bank`` in place
    (``function.py:511-565``) so later crops/images condition on it —
    ``write_bank=False`` disables (reads on a pre-trained bank only).
    """
    import os

    img = np.asarray(sample["image"], np.float32)
    H, W = img.shape[:2]
    crop_size = crop_size or cfg.image_size
    # decode-chunk size: each chunk is one jitted dispatch (+ one result pull
    # over the device link), so bigger chunks amortize dispatch and batch the
    # decoder wider on the MXU; 64 mirrors the reference's loop granularity
    max_batch = int(os.environ.get("MEDSAM2_NUCLEI_CHUNK", "64"))

    crops = crop_with_overlap(H, W, crop_size, overlap)
    processed_boxes: List[Tuple[int, int, int, int]] = []
    acc_points = np.zeros((0, 2), np.float32)
    acc_scores = np.zeros((0,), np.float32)
    point_id_map: Dict[Tuple[float, float], int] = {}

    masks_g: List[np.ndarray] = []
    mask_scores: List[float] = []
    boxes: List[np.ndarray] = []
    mask_pids: List[int] = []
    for (x0, y0) in crops:
        x1, y1, x2, y2 = x0, y0, x0 + crop_size, y0 + crop_size
        crop = img[y0:y0 + crop_size, x0:x0 + crop_size]
        # one host->device upload per crop, shared by the prompter and the
        # SAM decode (the e2e cost is transfer-dominated: chip compute for a
        # 256-px crop is ~1 ms total, scripts/profile_nuclei.py + BASELINE)
        crop_dev = jnp.asarray(crop[None])
        pts, scores = predict_points(params, rcfg, crop_dev,
                                     filtering=filtering)
        if len(pts):
            gpts = pts + np.array([x0, y0], np.float32)
            keep = drop_points_in_processed_boxes(gpts, processed_boxes)
            acc_points = np.concatenate([acc_points, gpts[keep]])
            acc_scores = np.concatenate([acc_scores, scores[keep]])
        processed_boxes.append((x1, y1, x2, y2))
        if len(acc_points) == 0:
            continue
        # progressive NMS over everything accumulated so far (function.py:386)
        keep = point_nms_np(acc_points, acc_scores, point_nms_dist)
        cur_points = acc_points[keep]
        cur_ids = np.array([point_id_map.setdefault(tuple(p), len(point_id_map))
                            for p in cur_points])
        in_crop = ((cur_points[:, 0] >= x1) & (cur_points[:, 0] < x2)
                   & (cur_points[:, 1] >= y1) & (cur_points[:, 1] < y2))
        if in_crop.sum() <= 1:  # the reference skips 0/1-point crops (:412)
            continue
        local = cur_points[in_crop] - np.array([x0, y0], np.float32)
        key, sub = jax.random.split(key)
        binm, ious, image_embed, vision_feats = decode_cells(
            params, cfg, local, bank, sub, crop_dev,
            bank_nonempty=bool(np.asarray(bank["valid"]).any()),
            max_batch=max_batch, return_memory=True, binary=True)
        if write_bank and len(binm):
            # the reference encodes the binarized union of this crop's decoded
            # masks and appends/replaces in the similarity bank
            # (function.py:511-565); writes are deterministic — only reads
            # sample. Mutates the caller's bank dict in place.
            sam_params = params["sam2"] if "sam2" in params else params
            union = jnp.asarray(binm.any(0).astype(np.float32))[None, :, :, None]
            bank.update(_jit_bank_write(cfg)(
                sam_params, vision_feats[-1], union.transpose(0, 3, 1, 2),
                bank, jnp.float32(ious.mean()),
                image_embed.reshape(1, -1).astype(jnp.float32)))
        pids = cur_ids[in_crop]
        for k in range(len(local)):
            m = binm[k]
            if min_area and m.sum() < min_area:
                continue
            gm = np.zeros((H, W), bool)
            gm[y0:y0 + crop_size, x0:x0 + crop_size] = m
            masks_g.append(gm)
            # merge scores are the raw predicted IoUs — mask_post_eval stores
            # predicted_iou and both merge stages rank by it
            # (function.py:568-570, 615-620); stability is computed but never
            # filters at the eval thresholds (0.0)
            mask_scores.append(float(ious[k]))
            boxes.append(batched_mask_to_box(gm[None])[0])
            mask_pids.append(int(pids[k]))

    if not masks_g:
        return np.zeros((H, W), np.int32)
    return merge_instances(masks_g, np.asarray(mask_scores, np.float32),
                           np.stack(boxes), np.asarray(mask_pids), (H, W),
                           mask_nms_thresh)

"""SAM2AutomaticMaskGenerator (rebuild of
``sam2_train/automatic_mask_generator.py``).

Grid prompting: ``points_per_side^2`` points decoded multimask in batches (each
batch one jitted call with the points as the batch axis), filtered by predicted
IoU and stability score, deduplicated with box NMS per crop and across crops,
encoded as RLE records.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config
from medsam2_tpu.api.image_predictor import SAM2ImagePredictor
from medsam2_tpu.ops.nms import batched_nms_np
from medsam2_tpu.ops.connected_components import remove_small_regions
from medsam2_tpu.postproc import amg_utils as amg


class SAM2AutomaticMaskGenerator:
    def __init__(
        self,
        params,
        cfg: SAM2Config,
        points_per_side: Optional[int] = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.8,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        mask_threshold: float = 0.0,
        box_nms_thresh: float = 0.7,
        crop_n_layers: int = 0,
        crop_nms_thresh: float = 0.7,
        crop_overlap_ratio: float = 512 / 1500,
        crop_n_points_downscale_factor: int = 1,
        point_grids: Optional[List[np.ndarray]] = None,
        min_mask_region_area: int = 0,
        output_mode: str = "binary_mask",
        multimask_output: bool = True,
        use_m2m: bool = False,
        **kwargs,
    ):
        assert (points_per_side is None) != (point_grids is None), \
            "Exactly one of points_per_side or point_grids must be provided."
        if points_per_side is not None:
            self.point_grids = amg.build_all_layer_point_grids(
                points_per_side, crop_n_layers, crop_n_points_downscale_factor)
        else:
            self.point_grids = point_grids
        assert output_mode in ("binary_mask", "uncompressed_rle", "coco_rle")

        self.predictor = SAM2ImagePredictor(params, cfg)
        self.cfg = cfg
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.mask_threshold = mask_threshold
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.crop_n_points_downscale_factor = crop_n_points_downscale_factor
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode
        self.multimask_output = multimask_output
        self.use_m2m = use_m2m

        self._decode_grid = jax.jit(_decode_point_grid, static_argnames=("cfg",))
        self._refine_m2m = jax.jit(_refine_with_m2m, static_argnames=("cfg",))
        self._score = jax.jit(
            _score_and_pack_masks,
            static_argnames=("out_hw", "mask_threshold", "stability_offset"))

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """image: HWC uint8 RGB -> list of mask records (``:152-204``)."""
        mask_data = self._generate_masks(image)

        if self.min_mask_region_area > 0:
            mask_data = self.postprocess_small_regions(
                mask_data, self.min_mask_region_area,
                max(self.box_nms_thresh, self.crop_nms_thresh))

        if self.output_mode == "coco_rle":
            mask_data["segmentations"] = [
                amg.coco_encode_rle(r) for r in mask_data["rles"]]
        elif self.output_mode == "binary_mask":
            mask_data["segmentations"] = [amg.rle_to_mask(r) for r in mask_data["rles"]]
        else:
            mask_data["segmentations"] = mask_data["rles"]

        curr_anns = []
        for idx in range(len(mask_data["segmentations"])):
            ann = {
                "segmentation": mask_data["segmentations"][idx],
                "area": amg.area_from_rle(mask_data["rles"][idx]),
                "bbox": amg.box_xyxy_to_xywh(mask_data["boxes"][idx]).tolist(),
                "predicted_iou": float(mask_data["iou_preds"][idx]),
                "point_coords": [mask_data["points"][idx].tolist()],
                "stability_score": float(mask_data["stability_score"][idx]),
                "crop_box": amg.box_xyxy_to_xywh(mask_data["crop_boxes"][idx]).tolist(),
            }
            curr_anns.append(ann)
        return curr_anns

    def _generate_masks(self, image: np.ndarray) -> amg.MaskData:
        orig_size = image.shape[:2]
        crop_boxes, layer_idxs = amg.generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio)

        data = amg.MaskData()
        for crop_box, layer_idx in zip(crop_boxes, layer_idxs):
            crop_data = self._process_crop(image, crop_box, layer_idx, orig_size)
            data.cat(crop_data)

        if len(crop_boxes) > 1 and len(data["boxes"]) > 0:
            # prefer masks from smaller crops (``:219-229``)
            scores = 1 / amg.box_xyxy_to_xywh(np.asarray(data["crop_boxes"]))[:, 2]
            keep = batched_nms_np(
                np.asarray(data["boxes"], np.float32), scores,
                np.zeros(len(scores)), self.crop_nms_thresh)
            data.filter(keep)
        data.to_numpy()
        return data

    def _process_crop(self, image, crop_box, crop_layer_idx, orig_size) -> amg.MaskData:
        x0, y0, x1, y1 = crop_box
        cropped_im = image[y0:y1, x0:x1, :]
        cropped_im_size = cropped_im.shape[:2]
        self.predictor.set_image(cropped_im)

        points_scale = np.array(cropped_im_size)[None, ::-1]
        points_for_image = self.point_grids[crop_layer_idx] * points_scale

        # Phase 1: dispatch every point batch (async — nothing is pulled, so
        # the 16 decode+score dispatches pipeline on device back to back).
        dev_batches, host_points = [], []
        for (points,) in amg.batch_iterator(self.points_per_batch, points_for_image):
            dev_batches.append(self._decode_score_batch(points, cropped_im_size))
            host_points.append(points)
        self.predictor.reset_predictor()

        # Phase 2: ONE blocking pull per score array for the whole crop (a
        # per-batch pull pays the full device-link round trip ~48 times).
        iou_flat = np.asarray(jnp.concatenate([b[0] for b in dev_batches]), np.float32) \
            if dev_batches else np.zeros(0, np.float32)
        stability = np.asarray(jnp.concatenate([b[1] for b in dev_batches]), np.float32) \
            if dev_batches else np.zeros(0, np.float32)
        boxes = np.asarray(jnp.concatenate([b[2] for b in dev_batches]), np.float32).reshape(-1, 4) \
            if dev_batches else np.zeros((0, 4), np.float32)
        points_rep = np.concatenate(
            [np.repeat(p, b[4], axis=0) for p, b in zip(host_points, dev_batches)]) \
            if dev_batches else np.zeros((0, 2), np.float32)

        # Phase 3: host-side filters on the scalar arrays only.
        orig_h, orig_w = orig_size
        keep_mask = np.ones(len(iou_flat), bool)
        if self.pred_iou_thresh > 0.0:
            keep_mask &= iou_flat > self.pred_iou_thresh
        if self.stability_score_thresh > 0.0:
            keep_mask &= stability >= self.stability_score_thresh
        keep_mask &= ~amg.is_box_near_crop_edge(
            boxes, crop_box, [0, 0, orig_w, orig_h])
        kept_idx = np.flatnonzero(keep_mask)

        data = amg.MaskData(
            iou_preds=iou_flat[kept_idx],
            points=points_rep[kept_idx],
            stability_score=stability[kept_idx],
            boxes=boxes[kept_idx],
        )

        n = len(data["boxes"])
        if n > 0:
            keep = batched_nms_np(
                np.asarray(data["boxes"], np.float32),
                np.asarray(data["iou_preds"], np.float32),
                np.zeros(n), self.box_nms_thresh)
            data.filter(keep)
            # final survivor rows in the concatenated candidate order
            keep = kept_idx[np.asarray(keep)]
        else:
            keep = np.zeros(0, np.int64)

        # Phase 4: ONE device->host mask transfer for the whole crop, of the
        # NMS survivors only. Per-batch transfers of every candidate moved
        # ~400 MB over the device link at the default config and were 98% of
        # generate() wall time; the filters only ever needed scores and boxes.
        H, W = cropped_im_size
        if len(keep) > 0:
            dev_packed = [b[3] for b in dev_batches]
            dev = dev_packed[0] if len(dev_packed) == 1 else jnp.concatenate(dev_packed, 0)
            packed = np.asarray(jnp.take(dev, jnp.asarray(keep, jnp.int32), axis=0))
            masks = np.unpackbits(packed, axis=-1, count=W).astype(bool)
            masks = amg.uncrop_masks(masks, crop_box, orig_h, orig_w)
            data["rles"] = amg.mask_to_rle(masks)
        else:
            data["rles"] = []

        data["boxes"] = np.asarray(
            amg.uncrop_boxes_xyxy(data["boxes"], crop_box), np.float32).reshape(-1, 4)
        data["points"] = np.asarray(
            amg.uncrop_points(data["points"], crop_box), np.float32).reshape(-1, 2)
        data["crop_boxes"] = np.asarray(
            [crop_box] * len(data["rles"]), np.float32).reshape(-1, 4)
        return data

    def _decode_score_batch(self, points, im_size):
        """Decode + score one point batch fully ON DEVICE; returns device
        arrays (iou [nrm], stability [nrm], boxes [nrm, 4], packed masks
        [nrm, H, W/8], M) with NO host synchronization, so consecutive
        batches pipeline on the accelerator.

        Scoring runs on device (upsample to crop size, stability, boxes,
        thresholded masks bit-packed): pulling the fp32 mask stack to the
        host per batch moves ~0.8 GB over the device link at the default
        config; the packed binary masks + scalars are ~30x smaller and only
        the filter survivors are ever transferred."""
        tr = self.predictor._transforms
        in_points = tr.transform_coords(points, normalize=True, orig_hw=im_size)

        # pad the final partial batch so every call reuses one jit trace
        n_real = len(in_points)
        pad = self.points_per_batch - n_real
        padded = np.pad(in_points, ((0, pad), (0, 0))) if pad else in_points
        coords = jnp.asarray(padded[:, None, :], jnp.float32)   # [B, 1, 2]
        labels = jnp.asarray(
            np.pad(np.ones(n_real, np.int32), (0, pad), constant_values=-1)[:, None])
        low_res, iou_preds = self._decode_grid(
            self.predictor.params, self.predictor._features, coords, labels,
            cfg=self.cfg)
        if self.use_m2m:
            # second pass: EVERY candidate mask re-fed as a single-mask prompt
            # with its point (automatic_mask_generator.py:326-335,417-434) —
            # the reference refines all B*M flattened candidates, not just the
            # best per point, and its predictor clamps low-res logits to +/-32
            # before they can be re-fed (sam2_image_predictor.py:414)
            B, M = low_res.shape[:2]
            flat = jnp.clip(
                low_res.reshape(B * M, 1, *low_res.shape[2:]), -32.0, 32.0)
            low_res, iou_preds = self._refine_m2m(
                self.predictor.params, self.predictor._features,
                jnp.repeat(coords, M, axis=0), jnp.repeat(labels, M, axis=0),
                flat, cfg=self.cfg)
            low_res = low_res.reshape(B, M, *low_res.shape[2:])
            iou_preds = iou_preds.reshape(B, M)
        iou_flat, stability, boxes, packed = self._score(
            low_res, iou_preds, out_hw=tuple(im_size),
            mask_threshold=self.mask_threshold,
            stability_offset=self.stability_score_offset)
        M = low_res.shape[1]
        nrm = n_real * M
        return (iou_flat[:nrm], stability[:nrm], boxes[:nrm], packed[:nrm], M)

    @staticmethod
    def postprocess_small_regions(mask_data: amg.MaskData, min_area: int,
                                  nms_thresh: float) -> amg.MaskData:
        """Remove small islands/holes then dedupe (``:366-415``)."""
        if len(mask_data["rles"]) == 0:
            return mask_data
        new_masks, scores = [], []
        for rle in mask_data["rles"]:
            mask = amg.rle_to_mask(rle)
            m, changed = remove_small_regions(jnp.asarray(mask), min_area, "holes")
            unchanged = not bool(changed)
            m, changed = remove_small_regions(m, min_area, "islands")
            unchanged = unchanged and not bool(changed)
            new_masks.append(np.asarray(m))
            # unchanged masks get score 0 so NMS prefers them (``:397-399``)
            scores.append(float(unchanged))

        masks = np.stack(new_masks)
        boxes = amg.batched_mask_to_box(masks)
        keep = batched_nms_np(boxes, np.asarray(scores), np.zeros(len(boxes)),
                              nms_thresh)
        for i in keep:
            if scores[i] == 0.0:  # changed masks get re-encoded
                mask_data["rles"][i] = amg.mask_to_rle(masks[i][None])[0]
                mask_data["boxes"][i] = boxes[i]
        mask_data.filter(keep)
        return mask_data


def _refine_with_m2m(params, features, coords, labels, mask_input, *,
                     cfg: SAM2Config):
    """Single-mask refinement pass with the previous logits as a mask prompt."""
    from medsam2_tpu.core import sam2_model

    B = coords.shape[0]
    feats = {
        "image_embed": jnp.broadcast_to(
            features["image_embed"], (B, *features["image_embed"].shape[1:])),
        "high_res_feats": [
            jnp.broadcast_to(f, (B, *f.shape[1:])) for f in features["high_res_feats"]],
    }
    out = sam2_model.forward_sam_heads(
        params, cfg,
        backbone_features=feats["image_embed"],
        point_inputs={"point_coords": coords, "point_labels": labels},
        mask_inputs=mask_input.transpose(0, 2, 3, 1),
        high_res_features=feats["high_res_feats"],
        multimask_output=False,
        # eval-only path; the reference eval build swaps unstable single-mask
        # outputs for the best multimask candidate (mask_decoder.py:281-317)
        eval_dynamic_multimask=True,
    )
    return out.low_res_multimasks, out.ious


def _batched_mask_to_box_dev(masks: jnp.ndarray) -> jnp.ndarray:
    """Device XYXY boxes around bool masks [N, H, W]; empty -> zeros
    (the min/max trick of ``amg.py:305-348``)."""
    N, h, w = masks.shape
    in_h = jnp.any(masks, axis=-1)                       # [N, h]
    hc = in_h * jnp.arange(h)[None, :]
    bottom = jnp.max(hc, axis=-1)
    top = jnp.min(hc + h * (~in_h), axis=-1)
    in_w = jnp.any(masks, axis=-2)                       # [N, w]
    wc = in_w * jnp.arange(w)[None, :]
    right = jnp.max(wc, axis=-1)
    left = jnp.min(wc + w * (~in_w), axis=-1)
    empty = (right < left) | (bottom < top)
    box = jnp.stack([left, top, right, bottom], axis=-1).astype(jnp.float32)
    return jnp.where(empty[:, None], 0.0, box)


def _score_and_pack_masks(low_res, iou_preds, *, out_hw, mask_threshold: float,
                          stability_offset: float):
    """Upsample low-res logits to ``out_hw`` and compute everything the AMG
    filters need, on device: flat IoU predictions, stability scores, boxes,
    and the thresholded masks bit-packed along the width axis (uint8)."""
    from medsam2_tpu.core import layers

    B, M = low_res.shape[:2]
    up = layers.interpolate(
        low_res.astype(jnp.float32).transpose(0, 2, 3, 1), out_hw,
        method="bilinear").transpose(0, 3, 1, 2)
    flat = up.reshape(B * M, *out_hw)
    inter = jnp.sum((flat > (mask_threshold + stability_offset)), axis=(-1, -2))
    union = jnp.sum((flat > (mask_threshold - stability_offset)), axis=(-1, -2))
    stability = inter.astype(jnp.float32) / jnp.maximum(
        union.astype(jnp.float32), 1.0)
    binary = flat > mask_threshold
    boxes = _batched_mask_to_box_dev(binary)
    packed = jnp.packbits(binary, axis=-1)
    return iou_preds.reshape(B * M), stability, boxes, packed


def _decode_point_grid(params, features, coords, labels, *, cfg: SAM2Config):
    """One jitted multimask decode over a batch of single-point prompts."""
    from medsam2_tpu.core import sam2_model

    B = coords.shape[0]
    feats = {
        "image_embed": jnp.broadcast_to(
            features["image_embed"], (B, *features["image_embed"].shape[1:])),
        "high_res_feats": [
            jnp.broadcast_to(f, (B, *f.shape[1:])) for f in features["high_res_feats"]],
    }
    out = sam2_model.forward_sam_heads(
        params, cfg,
        backbone_features=feats["image_embed"],
        point_inputs={"point_coords": coords, "point_labels": labels},
        high_res_features=feats["high_res_feats"],
        multimask_output=True,
    )
    return out.low_res_multimasks, out.ious

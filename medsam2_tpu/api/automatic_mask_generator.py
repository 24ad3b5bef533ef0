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

        data = amg.MaskData()
        for (points,) in amg.batch_iterator(self.points_per_batch, points_for_image):
            batch_data = self._process_batch(
                points, cropped_im_size, crop_box, orig_size)
            data.cat(batch_data)
        self.predictor.reset_predictor()

        if len(data["boxes"]) > 0:
            keep = batched_nms_np(
                np.asarray(data["boxes"], np.float32),
                np.asarray(data["iou_preds"], np.float32),
                np.zeros(len(data["boxes"])), self.box_nms_thresh)
            data.filter(keep)

        data["boxes"] = np.asarray(
            amg.uncrop_boxes_xyxy(data["boxes"], crop_box), np.float32).reshape(-1, 4)
        data["points"] = np.asarray(
            amg.uncrop_points(data["points"], crop_box), np.float32).reshape(-1, 2)
        data["crop_boxes"] = np.asarray(
            [crop_box] * len(data["rles"]), np.float32).reshape(-1, 4)
        return data

    def _process_batch(self, points, im_size, crop_box, orig_size) -> amg.MaskData:
        orig_h, orig_w = orig_size
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
            # second pass: best mask per point re-fed as a mask prompt with the
            # point (automatic_mask_generator.py:417-434)
            best = jnp.argmax(iou_preds, axis=-1)
            bidx = jnp.arange(low_res.shape[0])
            low_res, iou_preds = self._refine_m2m(
                self.predictor.params, self.predictor._features, coords, labels,
                low_res[bidx, best][:, None], cfg=self.cfg)
        # upsample to crop size
        masks = tr.postprocess_masks(low_res, im_size)
        masks = np.asarray(masks, np.float32)[:n_real]
        iou_preds = np.asarray(iou_preds, np.float32)[:n_real]

        B, M = masks.shape[:2]
        data = amg.MaskData(
            masks=masks.reshape(B * M, *masks.shape[2:]),
            iou_preds=iou_preds.reshape(B * M),
            points=np.repeat(points, M, axis=0),
        )

        if self.pred_iou_thresh > 0.0:
            data.filter(data["iou_preds"] > self.pred_iou_thresh)

        data["stability_score"] = np.asarray(amg.calculate_stability_score(
            data["masks"], self.mask_threshold, self.stability_score_offset))
        if self.stability_score_thresh > 0.0:
            data.filter(data["stability_score"] >= self.stability_score_thresh)

        data["masks"] = data["masks"] > self.mask_threshold
        data["boxes"] = amg.batched_mask_to_box(data["masks"])

        keep = ~amg.is_box_near_crop_edge(
            data["boxes"], crop_box, [0, 0, orig_w, orig_h])
        if not np.all(keep):
            data.filter(keep)

        data["masks"] = amg.uncrop_masks(data["masks"], crop_box, orig_h, orig_w)
        data["rles"] = amg.mask_to_rle(data["masks"])
        del data["masks"]
        return data

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
    )
    return out.low_res_multimasks, out.ious


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

"""SAM2ImagePredictor: the reference's image-prompt API
(``sam2_train/sam2_image_predictor.py``) over jitted pure functions.

``set_image`` encodes once and caches features (with ``no_mem_embed`` added to
the lowest-res level, ``sam2_image_predictor.py:99-107``); ``predict`` runs the
prompt encoder + mask decoder under one jit trace per (point count, multimask)
signature. Prompts are NOT padded to shared slot counts: an extra padded
sentinel token measurably shifts the decoder's attention off the reference
arithmetic (see ``_prep_prompts``), and interactive use keeps the number of
distinct prompt counts — and hence traces — small.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config
from medsam2_tpu.core import sam2_model
from medsam2_tpu.utils.transforms import SAM2Transforms


class SAM2ImagePredictor:
    def __init__(self, params, cfg: SAM2Config, mask_threshold: float = 0.0,
                 max_hole_area: float = 0.0, max_sprinkle_area: float = 0.0):
        self.params = params
        self.cfg = cfg
        self._transforms = SAM2Transforms(
            resolution=cfg.image_size, mask_threshold=mask_threshold,
            max_hole_area=max_hole_area, max_sprinkle_area=max_sprinkle_area)
        self.mask_threshold = mask_threshold
        self._features = None
        self._orig_hw: List[Tuple[int, int]] = []
        self._is_image_set = False

        self._encode = jax.jit(functools.partial(_encode_image, cfg=cfg))
        self._decode = jax.jit(
            functools.partial(_decode_prompts, cfg=cfg),
            static_argnames=("multimask_output", "return_best"),
        )

    # -- reference API ----------------------------------------------------

    def set_image(self, image: np.ndarray) -> None:
        """image: HWC uint8/float RGB."""
        self.reset_predictor()
        self._orig_hw = [tuple(image.shape[:2])]
        x = self._transforms(image)[None]
        self._features = self._encode(self.params, x)
        self._is_image_set = True

    def set_image_batch(self, image_list) -> None:
        self.reset_predictor()
        self._orig_hw = [tuple(im.shape[:2]) for im in image_list]
        x = self._transforms.forward_batch(image_list)
        self._features = self._encode(self.params, x)
        self._is_image_set = True
        self._is_batch = True

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        mask_input: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
        normalize_coords: bool = True,
        img_idx: int = -1,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (masks [M, H, W], iou_predictions [M], low_res_masks [M, h, w])
        in numpy, matching ``SAM2ImagePredictor.predict`` (``:217-283``)."""
        if not self._is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) first.")
        coords, labels = self._prep_prompts(
            point_coords, point_labels, box, normalize_coords, img_idx)
        mask_in = None
        if mask_input is not None:
            m = np.asarray(mask_input, np.float32)
            if m.ndim == 3:
                m = m[None]
            mask_in = jnp.asarray(m.transpose(0, 2, 3, 1))  # [1, h, w, 1]

        if img_idx >= 0:
            feats = jax.tree_util.tree_map(
                lambda t: t[img_idx:img_idx + 1], self._features)
        else:
            feats = self._features

        low_res, ious = self._decode(
            self.params, feats, coords, labels, mask_in,
            multimask_output=multimask_output, return_best=False)

        hw = self._orig_hw[img_idx if img_idx >= 0 else 0]
        masks = self._transforms.postprocess_masks(low_res, hw)
        masks = np.asarray(masks[0])
        ious_np = np.asarray(ious[0])
        # the reference clamps returned low-res logits to +/-32 so they can be
        # re-fed as mask_input safely (sam2_image_predictor.py:414)
        low_np = np.clip(np.asarray(low_res[0]), -32.0, 32.0)
        if not return_logits:
            masks = masks > self.mask_threshold
        return masks, ious_np, low_np

    def predict_batch(self, point_coords_batch=None, point_labels_batch=None,
                      box_batch=None, mask_input_batch=None, multimask_output=True,
                      return_logits=False, normalize_coords=True):
        n = len(self._orig_hw)
        out_masks, out_ious, out_lows = [], [], []
        for i in range(n):
            pc = point_coords_batch[i] if point_coords_batch is not None else None
            pl = point_labels_batch[i] if point_labels_batch is not None else None
            bx = box_batch[i] if box_batch is not None else None
            mi = mask_input_batch[i] if mask_input_batch is not None else None
            m, iou, lo = self.predict(pc, pl, bx, mi, multimask_output,
                                      return_logits, normalize_coords, img_idx=i)
            out_masks.append(m)
            out_ious.append(iou)
            out_lows.append(lo)
        return out_masks, out_ious, out_lows

    def get_image_embedding(self):
        if not self._is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) first.")
        # [B, C, h, w] channels-first, as the reference exposes it
        return jnp.transpose(self._features["image_embed"], (0, 3, 1, 2))

    def reset_predictor(self) -> None:
        self._features = None
        self._orig_hw = []
        self._is_image_set = False
        self._is_batch = False

    # -- internals --------------------------------------------------------

    def _prep_prompts(self, point_coords, point_labels, box, normalize_coords, img_idx):
        hw = self._orig_hw[img_idx if img_idx >= 0 else 0]
        pts, lbl = [], []
        if box is not None:
            # box -> 2 points labeled 2, 3, placed before click points
            # (sam2_image_predictor.py:373-384)
            b = self._transforms.transform_boxes(box, normalize_coords, hw)[0]
            pts.append(b)
            lbl.append(np.array([2, 3], np.int32))
        if point_coords is not None:
            assert point_labels is not None
            c = self._transforms.transform_coords(
                np.asarray(point_coords, np.float32).reshape(-1, 2),
                normalize_coords, hw)
            pts.append(c)
            lbl.append(np.asarray(point_labels, np.int32).reshape(-1))
        if not pts:
            coords = np.zeros((1, 1, 2), np.float32)
            labels = -np.ones((1, 1), np.int32)
        else:
            coords = np.concatenate(pts, 0)[None]
            labels = np.concatenate(lbl, 0)[None]
        # No slot padding: a padded -1 slot is an EXTRA sentinel token on top
        # of the one the prompt encoder always appends (prompt_encoder.py:95-96)
        # and shifts the decoder's attention away from the reference's
        # arithmetic (~0.4% on iou preds). Each distinct prompt count costs
        # one decode trace, which interactive use keeps small.
        return jnp.asarray(coords), jnp.asarray(labels)


def _encode_image(params, x, *, cfg: SAM2Config):
    """Forward the encoder and cache decoder-ready features."""
    backbone_out = sam2_model.forward_image(params, cfg, x.astype(_dtype(cfg)))
    feats, pos, sizes = sam2_model.prepare_backbone_features(cfg, backbone_out)
    # Add no_mem_embed to the lowest-res features (directly_add_no_mem_embed
    # image path, sam2_image_predictor.py:99-101)
    image_embed = feats[-1]
    B, h, w, C = image_embed.shape
    image_embed = (image_embed.reshape(B, h * w, C)
                   + params["no_mem_embed"].astype(image_embed.dtype)).reshape(B, h, w, C)
    return {
        "image_embed": image_embed.astype(jnp.float32),
        "high_res_feats": [f.astype(jnp.float32) for f in feats[:-1]],
    }


def _decode_prompts(params, features, coords, labels, mask_input, *,
                    cfg: SAM2Config, multimask_output: bool, return_best: bool):
    outputs = sam2_model.forward_sam_heads(
        params, cfg,
        backbone_features=features["image_embed"],
        point_inputs={"point_coords": coords, "point_labels": labels},
        mask_inputs=mask_input,
        high_res_features=features["high_res_feats"] or None,
        multimask_output=multimask_output,
        # the image API is eval-only and the reference eval build enables the
        # stability fallback for single-mask outputs (build_sam.py:28-38,
        # mask_decoder.py:281-317)
        eval_dynamic_multimask=True,
    )
    if return_best:
        return outputs.low_res_masks, outputs.ious
    return outputs.low_res_multimasks, outputs.ious


def _dtype(cfg: SAM2Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

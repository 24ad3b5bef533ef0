"""AMG mask post-processing utilities (rebuild of ``sam2_train/utils/amg.py``).

Host-side numpy for the inherently sequential parts (RLE, crop generation);
jnp for the batched device-friendly parts (stability score, mask-to-box).
"""

from __future__ import annotations

import math
from copy import deepcopy
from itertools import product
from typing import Any, Dict, Generator, ItemsView, List, Tuple

import numpy as np
import jax.numpy as jnp


class MaskData:
    """Dict of batched tensors/lists with filter/cat/to_numpy
    (``amg.py:18-77``)."""

    def __init__(self, **kwargs):
        for v in kwargs.values():
            assert isinstance(v, (list, np.ndarray, jnp.ndarray)), \
                "MaskData only supports list, numpy, and jax arrays"
        self._stats: Dict[str, Any] = dict(**kwargs)

    def __setitem__(self, key, item):
        assert isinstance(item, (list, np.ndarray, jnp.ndarray))
        self._stats[key] = item

    def __delitem__(self, key):
        del self._stats[key]

    def __getitem__(self, key):
        return self._stats[key]

    def items(self) -> ItemsView[str, Any]:
        return self._stats.items()

    def filter(self, keep) -> None:
        keep = np.asarray(keep)
        for k, v in self._stats.items():
            if v is None:
                continue
            elif isinstance(v, (np.ndarray, jnp.ndarray)):
                self._stats[k] = np.asarray(v)[keep]
            elif isinstance(v, list) and keep.dtype == bool:
                self._stats[k] = [a for i, a in enumerate(v) if keep[i]]
            elif isinstance(v, list):
                self._stats[k] = [v[i] for i in keep]
            else:
                raise TypeError(f"MaskData key {k} has unsupported type {type(v)}")

    def cat(self, new_stats: "MaskData") -> None:
        for k, v in new_stats.items():
            if k not in self._stats or self._stats[k] is None:
                self._stats[k] = deepcopy(v)
            elif isinstance(v, (np.ndarray, jnp.ndarray)):
                self._stats[k] = np.concatenate([np.asarray(self._stats[k]), np.asarray(v)], axis=0)
            elif isinstance(v, list):
                self._stats[k] = self._stats[k] + deepcopy(v)
            else:
                raise TypeError(f"MaskData key {k} has unsupported type {type(v)}")

    def to_numpy(self) -> None:
        for k, v in self._stats.items():
            if isinstance(v, jnp.ndarray):
                self._stats[k] = np.asarray(v)


def is_box_near_crop_edge(boxes, crop_box, orig_box, atol: float = 20.0):
    """``amg.py:80-95``: boxes near the crop edge but not the original edge."""
    boxes = uncrop_boxes_xyxy(np.asarray(boxes, np.float32), crop_box)
    near_crop = np.isclose(boxes, np.asarray(crop_box, np.float32)[None], atol=atol)
    near_orig = np.isclose(boxes, np.asarray(orig_box, np.float32)[None], atol=atol)
    near_crop = near_crop & ~near_orig
    return np.any(near_crop, axis=1)


def box_xyxy_to_xywh(box_xyxy: np.ndarray) -> np.ndarray:
    box = np.array(box_xyxy, np.float32).copy()
    box[..., 2] = box[..., 2] - box[..., 0]
    box[..., 3] = box[..., 3] - box[..., 1]
    return box


def batch_iterator(batch_size: int, *args) -> Generator[List[Any], None, None]:
    assert len(args) > 0 and all(len(a) == len(args[0]) for a in args)
    n_batches = len(args[0]) // batch_size + int(len(args[0]) % batch_size != 0)
    for b in range(n_batches):
        yield [arg[b * batch_size: (b + 1) * batch_size] for arg in args]


def mask_to_rle(masks: np.ndarray) -> List[Dict[str, Any]]:
    """Fortran-order uncompressed RLE (``mask_to_rle_pytorch``, ``amg.py:109-137``).

    Uses the native C++ encoder (``native/postproc.cpp:rle_encode``) when
    available — it walks the row-major mask in column order directly, so the
    batch-transpose the numpy path needs never materializes."""
    masks = np.asarray(masks, bool)
    B, h, w = masks.shape
    if B == 0:
        return []
    from medsam2_tpu import native

    if native.lib() is not None:
        return [{"size": [h, w], "counts": native.rle_encode(masks[i])}
                for i in range(B)]
    flat = masks.transpose(0, 2, 1).reshape(B, -1)  # fortran order: column-major
    out = []
    for i in range(B):
        row = flat[i]
        diff = np.nonzero(row[1:] != row[:-1])[0] + 1
        cur_idxs = np.concatenate([[0], diff, [h * w]])
        btw_idxs = np.diff(cur_idxs)
        counts = [] if not row[0] else [0]
        counts.extend(btw_idxs.tolist())
        out.append({"size": [h, w], "counts": counts})
    return out


def rle_to_mask(rle: Dict[str, Any]) -> np.ndarray:
    """``amg.py:140-155``."""
    h, w = rle["size"]
    mask = np.empty(h * w, dtype=bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx: idx + count] = parity
        idx += count
        parity = not parity
    return mask.reshape(w, h).transpose()


def area_from_rle(rle: Dict[str, Any]) -> int:
    return sum(rle["counts"][1::2])


def coco_encode_rle(uncompressed_rle: Dict[str, Any]) -> Dict[str, Any]:
    """``amg.py:296-302``; requires pycocotools if installed, else returns input."""
    try:
        from pycocotools import mask as mask_utils  # type: ignore

        h, w = uncompressed_rle["size"]
        rle = mask_utils.frPyObjects(uncompressed_rle, h, w)
        rle["counts"] = rle["counts"].decode("utf-8")
        return rle
    except ImportError:
        return uncompressed_rle


def calculate_stability_score(masks, mask_threshold: float, threshold_offset: float):
    """IoU of +/- offset thresholdings, int32-sum trick (``amg.py:158-178``).
    masks: [..., H, W] logits (jnp or numpy)."""
    m = jnp.asarray(masks)
    intersections = jnp.sum(
        jnp.sum((m > (mask_threshold + threshold_offset)).astype(jnp.int32), axis=-1),
        axis=-1).astype(jnp.float32)
    unions = jnp.sum(
        jnp.sum((m > (mask_threshold - threshold_offset)).astype(jnp.int32), axis=-1),
        axis=-1).astype(jnp.float32)
    return intersections / jnp.maximum(unions, 1.0)


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Evenly spaced 2D grid in [0,1]^2 (``amg.py:181-188``)."""
    offset = 1 / (2 * n_per_side)
    points_one_side = np.linspace(offset, 1 - offset, n_per_side)
    points_x = np.tile(points_one_side[None, :], (n_per_side, 1))
    points_y = np.tile(points_one_side[:, None], (1, n_per_side))
    return np.stack([points_x, points_y], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: Tuple[int, ...], n_layers: int,
                        overlap_ratio: float) -> Tuple[List[List[int]], List[int]]:
    """Crop boxes of different sizes (``amg.py:202-236``)."""
    crop_boxes, layer_idxs = [], []
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes.append([0, 0, im_w, im_h])
    layer_idxs.append(0)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_crops_per_side))
        crop_w = crop_len(im_w, n_crops_per_side, overlap)
        crop_h = crop_len(im_h, n_crops_per_side, overlap)
        crop_box_x0 = [int((crop_w - overlap) * i) for i in range(n_crops_per_side)]
        crop_box_y0 = [int((crop_h - overlap) * i) for i in range(n_crops_per_side)]
        for x0, y0 in product(crop_box_x0, crop_box_y0):
            box = [x0, y0, min(x0 + crop_w, im_w), min(y0 + crop_h, im_h)]
            crop_boxes.append(box)
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def uncrop_boxes_xyxy(boxes, crop_box: List[int]) -> np.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return np.asarray(boxes, np.float32) + np.array([[x0, y0, x0, y0]], np.float32)


def uncrop_points(points, crop_box: List[int]) -> np.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return np.asarray(points, np.float32) + np.array([[x0, y0]], np.float32)


def uncrop_masks(masks: np.ndarray, crop_box: List[int], orig_h: int,
                 orig_w: int) -> np.ndarray:
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    pad = ((0, 0), (y0, orig_h - y1), (x0, orig_w - x1))
    return np.pad(np.asarray(masks), pad)


def batched_mask_to_box(masks) -> np.ndarray:
    """XYXY boxes around masks via min/max trick; empty mask -> [0,0,0,0]
    (``amg.py:305-348``). masks: [..., H, W] bool."""
    masks = np.asarray(masks, bool)
    if masks.size == 0:
        return np.zeros((*masks.shape[:-2], 4), np.float32)
    shape = masks.shape
    h, w = shape[-2:]
    flat = masks.reshape(-1, h, w)

    in_height = flat.max(axis=-1)
    in_height_coords = in_height * np.arange(h)[None, :]
    bottom_edges = in_height_coords.max(axis=-1)
    in_height_coords = in_height_coords + h * (~in_height)
    top_edges = in_height_coords.min(axis=-1)

    in_width = flat.max(axis=-2)
    in_width_coords = in_width * np.arange(w)[None, :]
    right_edges = in_width_coords.max(axis=-1)
    in_width_coords = in_width_coords + w * (~in_width)
    left_edges = in_width_coords.min(axis=-1)

    empty = (right_edges < left_edges) | (bottom_edges < top_edges)
    out = np.stack([left_edges, top_edges, right_edges, bottom_edges], axis=-1)
    out = out * (~empty)[..., None]
    return out.reshape(*shape[:-2], 4).astype(np.float32)


def mask_to_box(mask: np.ndarray) -> np.ndarray:
    """Single-mask box (``utils/misc.py:66-89`` semantics)."""
    return batched_mask_to_box(mask[None])[0]

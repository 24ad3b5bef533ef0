"""Image/coordinate transforms (rebuild of ``sam2_train/utils/transforms.py``).

Resize to model resolution + ImageNet normalize, coordinate/box mapping to
model space, and mask postprocessing back to the original resolution. The
resize/normalize also runs in-graph (``preprocess_batch``) so training input
pipelines can fuse it into the jitted step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from medsam2_tpu.core import layers

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class SAM2Transforms:
    """Reference: ``SAM2Transforms`` (``transforms.py:15-99``)."""

    def __init__(self, resolution: int, mask_threshold: float = 0.0,
                 max_hole_area: float = 0.0, max_sprinkle_area: float = 0.0):
        self.resolution = resolution
        self.mask_threshold = mask_threshold
        self.max_hole_area = max_hole_area
        self.max_sprinkle_area = max_sprinkle_area

    def __call__(self, image: np.ndarray) -> jnp.ndarray:
        """HWC uint8/float image -> [H_r, W_r, 3] normalized float32."""
        x = jnp.asarray(image, jnp.float32)
        if image.dtype == np.uint8 or x.max() > 2.0:
            x = x / 255.0
        # torchvision Resize (the reference preprocessing, ``transforms.py:28``)
        # antialiases tensor downscales by default.
        x = layers.interpolate(x[None], (self.resolution, self.resolution),
                               method="bilinear", antialias=True)[0]
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    def forward_batch(self, images) -> jnp.ndarray:
        return jnp.stack([self(im) for im in images])

    def transform_coords(self, coords: np.ndarray, normalize: bool = False,
                         orig_hw: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """Map (x, y) pixel coords to model resolution (``transforms.py:44-60``)."""
        coords = np.asarray(coords, np.float32).copy()
        if normalize:
            assert orig_hw is not None
            h, w = orig_hw
            coords[..., 0] = coords[..., 0] / w
            coords[..., 1] = coords[..., 1] / h
        return coords * self.resolution

    def transform_boxes(self, boxes: np.ndarray, normalize: bool = False,
                        orig_hw: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """XYXY boxes -> [B, 2, 2] corner points in model space."""
        return self.transform_coords(
            np.asarray(boxes, np.float32).reshape(-1, 2, 2), normalize, orig_hw)

    def postprocess_masks(self, masks: jnp.ndarray, orig_hw: Tuple[int, int]) -> jnp.ndarray:
        """[B, M, h, w] logits -> bilinear resize to original size
        (``transforms.py:74-99``; hole filling applied when configured)."""
        if self.max_hole_area > 0 or self.max_sprinkle_area > 0:
            from medsam2_tpu.ops.connected_components import fill_holes_and_sprinkles
            masks = fill_holes_and_sprinkles(
                masks, self.max_hole_area, self.max_sprinkle_area)
        x = jnp.transpose(masks, (0, 2, 3, 1))
        x = layers.interpolate(x.astype(jnp.float32), orig_hw, method="bilinear")
        return jnp.transpose(x, (0, 3, 1, 2))


def preprocess_batch(images: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """In-graph: [B, H, W, 3] float (0..255 or 0..1) -> normalized at model res."""
    x = images.astype(jnp.float32)
    x = jnp.where(jnp.max(x) > 2.0, x / 255.0, x)
    x = layers.interpolate(x, (resolution, resolution), method="bilinear",
                           antialias=True)
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

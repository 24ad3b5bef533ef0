"""Connected components on TPU — replaces the reference's CUDA union-find
kernel (``sam2_train/csrc/connected_components.cu``, exposed as
``_C.get_connected_componnets``).

Union-find doesn't map to XLA; instead we use iterative label propagation:
seed every foreground pixel with a unique index, then repeatedly max-pool
(3x3, 8-connectivity) masked to the foreground until fixed point. Convergence
is O(component diameter) per sweep; a power-of-two sweep schedule with
longer-range jumps (label doubling via gather) makes it O(log diameter) in
practice. Component areas come from a one-hot-free segment count (sort-free
``segment_sum`` over labels).

The two consumers tolerate approximation by iteration count:
``fill_holes_in_mask_scores`` (``utils/misc.py:247-258``) and AMG's
``remove_small_regions`` (``utils/amg.py:269-293``) only need small components
(area <= ~max_area) labeled correctly, which converge in few sweeps.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from medsam2_tpu.core import layers


def _propagate_once(labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """One 3x3 max-pool sweep, masked to foreground. labels [B, H, W]."""
    pooled = layers.max_pool2d(
        jnp.pad(labels, ((0, 0), (1, 1), (1, 1)))[..., None], (3, 3), (1, 1)
    )[..., 0]
    return jnp.where(mask, pooled, 0)


@functools.partial(jax.jit, static_argnames=("num_sweeps",))
def connected_components(mask: jnp.ndarray, num_sweeps: int = 32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """8-connectivity CCL of a boolean mask [B, H, W].

    Returns (labels [B, H, W] int32 — 0 = background, arbitrary distinct
    positive ids per component; areas [B, H, W] int32 — per-pixel area of the
    pixel's component, 0 on background). Matches the CUDA kernel's contract
    (labels + per-component counts, ``connected_components.cu:213-282``).

    ``num_sweeps`` bounds propagation distance: each sweep extends labels one
    pixel, then a pointer-jump doubles reach, so the default covers components
    with diameter ~2^? — in practice 32 sweeps with jumps handles 1024^2 masks.
    """
    B, H, W = mask.shape
    mask = mask.astype(bool)
    idx = jnp.arange(1, H * W + 1, dtype=jnp.int32).reshape(1, H, W)
    labels = jnp.where(mask, idx, 0)

    def body(_, labels):
        labels = _propagate_once(labels, mask)
        # pointer jumping: label <- label at the pixel that owns my label
        flat = labels.reshape(B, H * W)
        parent = jnp.take_along_axis(
            flat, jnp.maximum(flat - 1, 0), axis=1).reshape(B, H, W)
        return jnp.where(mask, jnp.maximum(labels, parent), 0)

    labels = jax.lax.fori_loop(0, num_sweeps, body, labels)

    # areas via bincount-over-flat-labels (segment sum on static size)
    flat = labels.reshape(B, H * W)
    ones = mask.reshape(B, H * W).astype(jnp.int32)
    counts = jax.vmap(
        lambda l, o: jnp.zeros((H * W + 1,), jnp.int32).at[l].add(o))(flat, ones)
    areas = jnp.take_along_axis(counts, flat, axis=1).reshape(B, H, W)
    areas = jnp.where(mask, areas, 0)
    return labels, areas


def fill_holes_in_mask_scores(mask_logits: jnp.ndarray, max_area: int,
                              num_sweeps: int = 32) -> jnp.ndarray:
    """Fill small holes (negative-region components with area <= max_area) with
    a small positive score 0.1 (``utils/misc.py:247-258``).

    mask_logits: [B, M, H, W] float logits.
    """
    if max_area <= 0:
        return mask_logits
    B, M, H, W = mask_logits.shape
    flat = mask_logits.reshape(B * M, H, W)
    holes = flat <= 0
    _, areas = connected_components(holes, num_sweeps)
    is_hole = holes & (areas <= max_area)
    filled = jnp.where(is_hole, 0.1, flat)
    return filled.reshape(B, M, H, W)


def remove_small_regions(mask: jnp.ndarray, area_thresh: float, mode: str,
                         num_sweeps: int = 32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Remove small disconnected regions ("islands") or holes
    (``utils/amg.py:269-293``, cv2-based in the reference).

    mask: [H, W] bool. Returns (mask, changed_any).
    """
    assert mode in ("holes", "islands")
    working = ~mask if mode == "holes" else mask
    labels, areas = connected_components(working[None], num_sweeps)
    labels, areas = labels[0], areas[0]
    # strictly < area_thresh, matching cv2-based reference (``amg.py:280``)
    small = (areas > 0) & (areas < area_thresh)
    changed = jnp.any(small)
    working = working & ~small
    if mode == "islands":
        # if every region was small, the reference keeps only the largest
        # component (``amg.py:283-285``); break area ties by smallest label
        max_area = jnp.max(areas)
        tie_label = jnp.min(jnp.where(areas == max_area, labels, jnp.iinfo(jnp.int32).max))
        largest_only = (labels == tie_label) & mask
        working = jnp.where(jnp.any(working), working, largest_only)
        return working, changed
    return ~working, changed


def fill_holes_and_sprinkles(mask_logits: jnp.ndarray, max_hole_area: float,
                             max_sprinkle_area: float) -> jnp.ndarray:
    """Hole + sprinkle filling used by ``SAM2Transforms.postprocess_masks``
    (``utils/transforms.py:74-99``)."""
    x = mask_logits
    if max_hole_area > 0:
        x = fill_holes_in_mask_scores(x, int(max_hole_area))
    if max_sprinkle_area > 0:
        B, M, H, W = x.shape
        flat = x.reshape(B * M, H, W)
        pos = flat > 0
        _, areas = connected_components(pos)
        sprinkle = pos & (areas <= max_sprinkle_area)
        flat = jnp.where(sprinkle, -0.1, flat)
        x = flat.reshape(B, M, H, W)
    return x

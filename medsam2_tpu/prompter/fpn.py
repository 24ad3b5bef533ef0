"""mmdet-style FPN for the prompter (rebuild of ``sam2_train/modeling/fpn.py``):
lateral 1x1 convs + 3x3 output convs, nearest top-down fusion, ``num_outs``
selecting how many pyramid levels to emit."""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from medsam2_tpu.core import layers


def fpn_init(key, in_channels: Sequence[int], out_channels: int = 256):
    n = len(in_channels)
    keys = jax.random.split(key, 2 * n)
    return {
        "lateral": [layers.conv2d_init(keys[i], c, out_channels, (1, 1))
                    for i, c in enumerate(in_channels)],
        "fpn": [layers.conv2d_init(keys[n + i], out_channels, out_channels, (3, 3))
                for i in range(n)],
    }


def fpn_apply(params, feats: List[jnp.ndarray], num_outs: int) -> List[jnp.ndarray]:
    """feats: highest-res first (stride 4..32). Returns ``num_outs`` levels,
    highest-res first (``fpn.py:15-283`` semantics with default options)."""
    laterals = [
        layers.conv2d_apply(p, f, explicit_padding=(0, 0))
        for p, f in zip(params["lateral"], feats)
    ]
    n = len(laterals)
    for i in range(n - 1, 0, -1):
        h, w = laterals[i - 1].shape[1:3]
        up = layers.interpolate(laterals[i].astype(jnp.float32), (h, w),
                                method="nearest").astype(laterals[i].dtype)
        laterals[i - 1] = laterals[i - 1] + up
    outs = [
        layers.conv2d_apply(p, l, explicit_padding=(1, 1))
        for p, l in zip(params["fpn"], laterals)
    ]
    return outs[:num_outs]

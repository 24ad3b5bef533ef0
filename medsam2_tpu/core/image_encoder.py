"""Image encoder: Hiera trunk + FPN neck (rebuild of
``sam2_train/modeling/backbones/image_encoder.py``).

The neck 1x1-convs each trunk level to d_model=256 and adds 2x-upsampled
top-down features only on ``fpn_top_down_levels`` (the two lowest-res levels in
the SAM2 presets); ``scalp=1`` drops the lowest-res level from the outputs.
Outputs are channels-last; sine position encodings are computed per level from
static shapes (host-cached, ``position_encoding.py:79-112``).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config, FpnNeckConfig
from medsam2_tpu.core import layers, hiera
from medsam2_tpu.core.pos_enc import sine_pos_embed


def fpn_neck_init(key, cfg: FpnNeckConfig):
    keys = jax.random.split(key, len(cfg.backbone_channel_list))
    return {
        "convs": [
            layers.conv2d_init(k, dim, cfg.d_model, (cfg.kernel_size, cfg.kernel_size))
            for k, dim in zip(keys, cfg.backbone_channel_list)
        ]
    }


def fpn_neck_apply(params, cfg: FpnNeckConfig, xs: List[jnp.ndarray]):
    """xs: trunk outputs, highest-res first (reverse of backbone_channel_list).

    Returns (features, pos) lists, highest-res first (``image_encoder.py:101-133``).
    """
    n = len(params["convs"]) - 1
    out = [None] * (n + 1)
    pos = [None] * (n + 1)
    prev = None
    for i in range(n, -1, -1):
        lateral = layers.conv2d_apply(
            params["convs"][n - i], xs[i],
            stride=(cfg.stride, cfg.stride),
            explicit_padding=(cfg.padding, cfg.padding),
        )
        if i in cfg.fpn_top_down_levels and prev is not None:
            h, w = lateral.shape[1], lateral.shape[2]
            top_down = layers.interpolate(
                prev.astype(jnp.float32), (h, w), method=cfg.fpn_interp_model
            ).astype(lateral.dtype)
            prev = lateral + top_down
            if cfg.fuse_type == "avg":
                prev = prev / 2
        else:
            prev = lateral
        out[i] = prev
        h, w = prev.shape[1], prev.shape[2]
        pos[i] = jnp.broadcast_to(
            sine_pos_embed(h, w, cfg.num_pos_feats).astype(prev.dtype)[None],
            prev.shape,
        )
    return out, pos


def image_encoder_init(key, cfg: SAM2Config):
    k1, k2 = jax.random.split(key)
    return {
        "trunk": hiera.hiera_init(k1, cfg.trunk),
        "neck": fpn_neck_init(k2, cfg.neck),
    }


def image_encoder_apply(params, cfg: SAM2Config, sample: jnp.ndarray,
                        trunk_pos_embed=None) -> Dict:
    """sample: [B, H, W, 3] -> dict with ``vision_features`` (lowest kept level),
    ``vision_pos_enc``, ``backbone_fpn`` (``image_encoder.py:29-42``)."""
    feats = hiera.hiera_apply(params["trunk"], cfg.trunk, sample,
                              pos_embed=trunk_pos_embed)
    features, pos = fpn_neck_apply(params["neck"], cfg.neck, feats)
    if cfg.scalp > 0:
        features, pos = features[: -cfg.scalp], pos[: -cfg.scalp]
    return {
        "vision_features": features[-1],
        "vision_pos_enc": pos,
        "backbone_fpn": features,
    }

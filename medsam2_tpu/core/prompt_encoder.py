"""Prompt encoder (rebuild of ``sam2_train/modeling/sam/prompt_encoder.py``).

Encodes point/box/mask prompts into sparse + dense embeddings. TPU-first
differences from the reference:

- Points are always a fixed-size [B, P, 2] array with int labels; label -1 is
  padding (the reference's own convention, ``prompt_encoder.py:95-96``), so
  variable click counts never change traced shapes. Boxes are expressed as two
  points labeled 2/3 by the caller (as ``sam2_image_predictor.py:373-384`` does).
- Label-conditional embedding add is a gather over a [6, C] table instead of
  boolean scatter-adds.
- The fork's force-resize of dense embeddings to 16x16 (``prompt_encoder.py:190``)
  is config (``SAM2Config.dense_embed_size``), not a hardcode, so the standard
  SAM2 paths keep full-resolution dense embeddings.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config
from medsam2_tpu.core import layers
from medsam2_tpu.core.pos_enc import random_pe_grid, random_pe_init, random_pe_points


def prompt_encoder_init(key, cfg: SAM2Config):
    embed_dim = cfg.hidden_dim
    keys = jax.random.split(key, 10)
    mask_in = cfg.mask_in_chans
    return {
        "pe_layer": random_pe_init(keys[0], embed_dim // 2),
        # 4 point-type embeddings: neg (0), pos (1), box tl (2), box br (3)
        "point_embeddings": [
            embedding_w(keys[1 + i], embed_dim) for i in range(4)
        ],
        "not_a_point_embed": embedding_w(keys[5], embed_dim),
        "no_mask_embed": embedding_w(keys[6], embed_dim),
        "mask_downscaling": {
            "conv1": layers.conv2d_init(keys[7], 1, mask_in // 4, (2, 2)),
            "ln1": layers.layer_norm_init(mask_in // 4),
            "conv2": layers.conv2d_init(keys[8], mask_in // 4, mask_in, (2, 2)),
            "ln2": layers.layer_norm_init(mask_in),
            "conv3": layers.conv2d_init(keys[9], mask_in, embed_dim, (1, 1)),
        },
    }


def embedding_w(key, dim):
    return {"w": jax.random.normal(key, (1, dim), jnp.float32)}


def get_dense_pe(params, cfg: SAM2Config) -> jnp.ndarray:
    """[1, H, W, C] dense position encoding for the decoder (``prompt_encoder.py:68-77``)."""
    s = cfg.sam_image_embedding_size
    return random_pe_grid(params["pe_layer"], s, s)[None]


def embed_points(params, cfg: SAM2Config, coords: jnp.ndarray, labels: jnp.ndarray,
                 pad: bool = True) -> jnp.ndarray:
    """coords [B, P, 2] pixel (x, y); labels [B, P] in {-1, 0, 1, 2, 3}.

    With ``pad=True`` appends the reference's sentinel padding point
    (``prompt_encoder.py:87-91``).
    """
    coords = coords.astype(jnp.float32) + 0.5  # shift to pixel center
    if pad:
        B = coords.shape[0]
        coords = jnp.concatenate([coords, jnp.zeros((B, 1, 2), coords.dtype)], axis=1)
        labels = jnp.concatenate([labels, -jnp.ones((B, 1), labels.dtype)], axis=1)
    pe = random_pe_points(params["pe_layer"], coords, (cfg.image_size, cfg.image_size))
    # label -1: zero out the Fourier PE and use not_a_point_embed instead.
    is_pad = (labels == -1)[..., None]
    pe = jnp.where(is_pad, 0.0, pe)
    table = jnp.concatenate(
        [params["not_a_point_embed"]["w"]]
        + [p["w"] for p in params["point_embeddings"]],
        axis=0,
    )  # [5, C]: index 0 = padding, 1..4 = labels 0..3
    type_embed = table[labels + 1]
    return pe + type_embed


def embed_masks(params, masks: jnp.ndarray) -> jnp.ndarray:
    """masks [B, H, W, 1] -> [B, H/4, W/4, C] dense embedding (``prompt_encoder.py:57-65``)."""
    p = params["mask_downscaling"]
    x = layers.conv2d_apply(p["conv1"], masks, stride=(2, 2), explicit_padding=(0, 0))
    x = layers.layer_norm_2d_apply(p["ln1"], x)
    x = layers.gelu(x)
    x = layers.conv2d_apply(p["conv2"], x, stride=(2, 2), explicit_padding=(0, 0))
    x = layers.layer_norm_2d_apply(p["ln2"], x)
    x = layers.gelu(x)
    return layers.conv2d_apply(p["conv3"], x, explicit_padding=(0, 0))


def prompt_encoder_apply(
    params,
    cfg: SAM2Config,
    points: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    boxes: Optional[jnp.ndarray] = None,
    masks: Optional[jnp.ndarray] = None,
    batch_size: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sparse [B, N, C], dense [B, h, w, C]) embeddings
    (``prompt_encoder.py:140-190``)."""
    embed_dim = cfg.hidden_dim
    sparse_list = []
    bs = batch_size
    if points is not None:
        coords, labels = points
        bs = coords.shape[0]
        sparse_list.append(embed_points(params, cfg, coords, labels, pad=(boxes is None)))
    if boxes is not None:
        bs = boxes.shape[0]
        corners = (boxes.astype(jnp.float32) + 0.5).reshape(-1, 2, 2)
        pe = random_pe_points(params["pe_layer"], corners, (cfg.image_size, cfg.image_size))
        pe = pe.at[:, 0, :].add(params["point_embeddings"][2]["w"][0])
        pe = pe.at[:, 1, :].add(params["point_embeddings"][3]["w"][0])
        sparse_list.append(pe.reshape(bs, -1, embed_dim))
    sparse = (
        jnp.concatenate(sparse_list, axis=1)
        if sparse_list
        else jnp.zeros((bs, 0, embed_dim))
    )

    s = cfg.sam_image_embedding_size
    if masks is not None:
        dense = embed_masks(params, masks)
    else:
        dense = jnp.broadcast_to(
            params["no_mask_embed"]["w"].reshape(1, 1, 1, embed_dim), (bs, s, s, embed_dim)
        )
    if cfg.dense_embed_size is not None:
        dense = layers.interpolate(
            dense, (cfg.dense_embed_size, cfg.dense_embed_size), method="bilinear"
        )
    return sparse, dense

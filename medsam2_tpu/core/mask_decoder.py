"""Mask decoder (rebuild of ``sam2_train/modeling/sam/mask_decoder.py``).

Tokens = [obj_score?, iou, 4 mask tokens, sparse prompts] run through the
two-way transformer against the (dense-prompt-conditioned) image embedding;
masks come from 4 hypernetwork MLPs applied to a 4x-upscaled embedding fused
with high-res skip features; plus IoU and object-score heads and the dynamic
single<->multi mask stability fallback.

TPU-first change: the fork's required ``cell_nums`` repeat_interleave
(``mask_decoder.py:215-231``, which breaks the inherited video/image paths) is
replaced by an optional ``image_indices`` gather — a static-shape int array
mapping each prompt row to its source image row. ``None`` preserves standard
SAM2 behaviour on every path; the 2D nuclei engine passes precomputed indices.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config
from medsam2_tpu.core import layers
from medsam2_tpu.core.transformer import two_way_transformer_apply, two_way_transformer_init


def mask_decoder_init(key, cfg: SAM2Config):
    dim = cfg.hidden_dim
    num_mask_tokens = cfg.num_multimask_outputs + 1
    ks = jax.random.split(key, 12)
    p = {
        "transformer": two_way_transformer_init(
            ks[0], cfg.twoway_depth, dim, cfg.twoway_num_heads, cfg.twoway_mlp_dim,
            cfg.attention_downsample_rate,
        ),
        "iou_token": {"w": jax.random.normal(ks[1], (1, dim), jnp.float32)},
        "mask_tokens": {"w": jax.random.normal(ks[2], (num_mask_tokens, dim), jnp.float32)},
        "output_upscaling": {
            "dc1": layers.conv_transpose2d_init(ks[3], dim, dim // 4, (2, 2)),
            "ln": layers.layer_norm_init(dim // 4),
            "dc2": layers.conv_transpose2d_init(ks[4], dim // 4, dim // 8, (2, 2)),
        },
        "output_hypernetworks_mlps": [
            layers.mlp_init(k, dim, dim, dim // 8, 3)
            for k in jax.random.split(ks[5], num_mask_tokens)
        ],
        "iou_prediction_head": layers.mlp_init(
            ks[6], dim, cfg.iou_head_hidden_dim, num_mask_tokens, cfg.iou_head_depth
        ),
    }
    if cfg.use_high_res_features_in_sam:
        p["conv_s0"] = layers.conv2d_init(ks[7], dim, dim // 8, (1, 1))
        p["conv_s1"] = layers.conv2d_init(ks[8], dim, dim // 4, (1, 1))
    if cfg.pred_obj_scores:
        p["obj_score_token"] = {"w": jax.random.normal(ks[9], (1, dim), jnp.float32)}
        if cfg.pred_obj_scores_mlp:
            p["pred_obj_score_head"] = layers.mlp_init(ks[10], dim, dim, 1, 3)
        else:
            p["pred_obj_score_head"] = layers.linear_init(ks[10], dim, 1)
    return p


def predict_masks(
    p,
    cfg: SAM2Config,
    image_embeddings: jnp.ndarray,      # [B, h, w, C]
    image_pe: jnp.ndarray,              # [1, h, w, C]
    sparse_prompt_embeddings: jnp.ndarray,  # [N, T, C]
    dense_prompt_embeddings: jnp.ndarray,   # [N or B, h, w, C]
    high_res_features: Optional[List[jnp.ndarray]] = None,
    image_indices: Optional[jnp.ndarray] = None,  # [N] int: prompt row -> image row
):
    num_mask_tokens = cfg.num_multimask_outputs + 1
    s = 1 if cfg.pred_obj_scores else 0
    N = sparse_prompt_embeddings.shape[0]
    dtype = image_embeddings.dtype

    token_list = [p["iou_token"]["w"], p["mask_tokens"]["w"]]
    if cfg.pred_obj_scores:
        token_list.insert(0, p["obj_score_token"]["w"])
    output_tokens = jnp.concatenate(token_list, axis=0).astype(dtype)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens[None], (N, *output_tokens.shape)),
         sparse_prompt_embeddings.astype(dtype)],
        axis=1,
    )

    if image_indices is not None:
        src = image_embeddings[image_indices]
        high_res_features = (
            [f[image_indices] for f in high_res_features] if high_res_features else None
        )
    else:
        src = image_embeddings
    src = src + dense_prompt_embeddings.astype(dtype)
    pos_src = jnp.broadcast_to(image_pe.astype(dtype), src.shape)
    b, h, w, c = src.shape

    hs, src_out = two_way_transformer_apply(
        p["transformer"], src, pos_src, tokens, cfg.twoway_num_heads
    )
    iou_token_out = hs[:, s, :]
    mask_tokens_out = hs[:, s + 1 : s + 1 + num_mask_tokens, :]

    src_out = src_out.reshape(b, h, w, c)
    up = p["output_upscaling"]
    x = layers.conv_transpose2d_apply(up["dc1"], src_out, (2, 2))
    if cfg.use_high_res_features_in_sam:
        feat_s0, feat_s1 = high_res_features
        x = layers.gelu(layers.layer_norm_2d_apply(up["ln"], x + feat_s1.astype(dtype)))
        x = layers.conv_transpose2d_apply(up["dc2"], x, (2, 2))
        upscaled = layers.gelu(x + feat_s0.astype(dtype))
    else:
        x = layers.gelu(layers.layer_norm_2d_apply(up["ln"], x))
        upscaled = layers.gelu(layers.conv_transpose2d_apply(up["dc2"], x, (2, 2)))

    hyper_in = jnp.stack(
        [layers.mlp_apply(mp, mask_tokens_out[:, i, :])
         for i, mp in enumerate(p["output_hypernetworks_mlps"])],
        axis=1,
    )  # [N, M, C/8]
    bh, hh, wh, ch = upscaled.shape
    masks = jnp.einsum("nmc,nhwc->nmhw", hyper_in, upscaled,
                       precision=layers.PRECISION)

    iou_pred = layers.mlp_apply(p["iou_prediction_head"], iou_token_out,
                                sigmoid_output=cfg.iou_prediction_use_sigmoid)
    if cfg.pred_obj_scores:
        if cfg.pred_obj_scores_mlp:
            object_score_logits = layers.mlp_apply(p["pred_obj_score_head"], hs[:, 0, :])
        else:
            object_score_logits = layers.linear_apply(p["pred_obj_score_head"], hs[:, 0, :])
    else:
        # sigmoid(10) ~= 1: assume object present (mask_decoder.py:264-265)
        object_score_logits = 10.0 * jnp.ones((N, 1), iou_pred.dtype)

    return masks, iou_pred, mask_tokens_out, object_score_logits


def _stability_scores(mask_logits, delta: float):
    """IoU between +delta/-delta thresholdings (``mask_decoder.py:269-279``)."""
    flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
    area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
    area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
    return jnp.where(area_u > 0, area_i / area_u, 1.0)


def _dynamic_multimask_via_stability(masks, iou_pred, delta: float, thresh: float):
    """Fall back from the single-mask token to the best multimask token when the
    single mask is unstable (``mask_decoder.py:281-317``)."""
    multimask_logits = masks[:, 1:]
    multimask_iou = iou_pred[:, 1:]
    best = jnp.argmax(multimask_iou, axis=-1)
    bidx = jnp.arange(masks.shape[0])
    best_logits = multimask_logits[bidx, best][:, None]
    best_iou = multimask_iou[bidx, best][:, None]

    single_logits = masks[:, 0:1]
    single_iou = iou_pred[:, 0:1]
    stable = _stability_scores(single_logits, delta) >= thresh
    out_masks = jnp.where(stable[..., None, None], single_logits, best_logits)
    out_iou = jnp.where(stable, single_iou, best_iou)
    return out_masks, out_iou


def mask_decoder_apply(
    p,
    cfg: SAM2Config,
    image_embeddings,
    image_pe,
    sparse_prompt_embeddings,
    dense_prompt_embeddings,
    multimask_output: bool,
    high_res_features=None,
    image_indices=None,
    dynamic_multimask_via_stability: bool = False,
    dynamic_multimask_stability_delta: float = 0.05,
    dynamic_multimask_stability_thresh: float = 0.98,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (masks [N, M, H, W], iou_pred [N, M], sam_tokens_out [N, m, C],
    object_score_logits [N, 1]) (``mask_decoder.py:110-168``)."""
    masks, iou_pred, mask_tokens_out, object_score_logits = predict_masks(
        p, cfg, image_embeddings, image_pe, sparse_prompt_embeddings,
        dense_prompt_embeddings, high_res_features, image_indices,
    )

    if multimask_output:
        masks = masks[:, 1:]
        iou_pred = iou_pred[:, 1:]
    elif dynamic_multimask_via_stability:
        masks, iou_pred = _dynamic_multimask_via_stability(
            masks, iou_pred, dynamic_multimask_stability_delta,
            dynamic_multimask_stability_thresh,
        )
    else:
        masks = masks[:, 0:1]
        iou_pred = iou_pred[:, 0:1]

    if multimask_output and cfg.use_multimask_token_for_obj_ptr:
        sam_tokens_out = mask_tokens_out[:, 1:]
    else:
        sam_tokens_out = mask_tokens_out[:, 0:1]

    return masks, iou_pred, sam_tokens_out, object_score_logits

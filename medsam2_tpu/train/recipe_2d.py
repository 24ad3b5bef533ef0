"""2D training recipe with the similarity memory bank — the TPU-native
``func_2d`` engine (REFUGE click-prompt variant; the nuclei joint-prompter
variant layers the DPA-P2PNet criterion on top, see ``train/recipe_nuclei.py``).

Reference flow (``func_2d/function.py:27-266``): encode batch -> condition the
top-level features on memories sampled from the cross-image similarity bank ->
prompt encoder (no grad) -> mask decoder -> upscale -> memory encoder -> bank
insert/replace -> loss/backprop (joint AdamW, prompter grad-clip 0.1).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from medsam2_tpu.configs import SAM2Config
from medsam2_tpu.core import layers, sam2_model
from medsam2_tpu.state import similarity_bank as sb
from medsam2_tpu.train.losses import bce_with_logits, dice_loss, iou_between


@dataclasses.dataclass(frozen=True)
class Recipe2DConfig:
    memory_bank_size: int = 16        # cfg.py:56
    lr: float = 1e-4
    weight_decay: float = 1e-4
    pos_weight: float = 2.0
    out_size: int = 1024              # loss resolution
    clip_grad: float = 0.1
    iou_loss_weight: float = 1.0      # MaskIoULoss (criterion.py:11-29)


def encode_and_condition(params, cfg: SAM2Config, images, bank, key,
                         bank_nonempty: bool, num_samples: int,
                         dropout_key=None):
    """Image encoder + similarity-bank memory conditioning
    (``func_2d/function.py:70-129``). Returns (image_embed, high_res_feats,
    vision_feats list for the memory encoder). ``dropout_key`` activates the
    memory-attention training dropout (rate 0.1 in the reference)."""
    backbone_out = sam2_model.forward_image(
        params, cfg, images.astype(_dtype(cfg)))
    feats, pos, sizes = sam2_model.prepare_backbone_features(cfg, backbone_out)
    top = feats[-1]
    B, h, w, C = top.shape

    if bank_nonempty:
        cur_embeds = top.reshape(B, -1).astype(jnp.float32)
        memory, _ = sb.read_similarity_bank(bank, cur_embeds, key, num_samples)
        from medsam2_tpu.core.memory import memory_attention_apply
        top_tokens = top.reshape(B, h * w, C)
        pos_tokens = pos[-1].reshape(B, h * w, C).astype(top.dtype)
        mem_pos = _bank_memory_pos(cfg, num_samples).astype(top.dtype)
        conditioned = memory_attention_apply(
            params["memory_attention"], cfg.memory_attention,
            top_tokens, memory.astype(top.dtype), pos_tokens,
            jnp.broadcast_to(mem_pos[None], (B, *mem_pos.shape)),
            q_hw=(w, h), num_obj_ptr_tokens=0, dropout_key=dropout_key,
        )
        top = conditioned.reshape(B, h, w, C)
    # empty bank: the reference adds a zero parameter (a no-op, ``:87-89``)

    # the reference mutates vision_feats[-1] in place (``:119``), so the
    # memory encoder downstream sees the CONDITIONED top feature — return the
    # list with the conditioned top substituted
    return top, feats[:-1], feats[:-1] + [top]


@functools.lru_cache(maxsize=8)
def _bank_memory_pos_np(mem_h: int, mem_dim: int, num_samples: int):
    import numpy as np
    from medsam2_tpu.core.pos_enc import sine_pos_embed_grid
    pos = sine_pos_embed_grid(mem_h, mem_h, mem_dim).reshape(-1, mem_dim)
    return np.tile(pos, (num_samples, 1))


def _bank_memory_pos(cfg: SAM2Config, num_samples: int):
    s = cfg.sam_image_embedding_size
    return jnp.asarray(_bank_memory_pos_np(s, cfg.mem_dim, num_samples))


def _dtype(cfg: SAM2Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def forward_2d(params, cfg: SAM2Config, rcfg: Recipe2DConfig, images, coords,
               labels, bank, key, bank_nonempty: bool,
               multimask_output: bool = False, dropout_key=None,
               is_eval: bool = False):
    """One 2D forward: returns (pred logits [B, out, out], iou_pred [B],
    new bank, aux dict). ``dropout_key`` enables training dropout. ``is_eval``
    turns on the decoder's dynamic-stability fallback for single-mask outputs,
    which the reference applies at validation (``net.eval()`` at
    ``func_2d/function.py:271`` with the ``build_sam2`` postprocessing
    override) but not during training (``mask_decoder.py:151``)."""
    B = images.shape[0]
    num_samples = B
    k1, _ = jax.random.split(key)
    image_embed, high_res, vision_feats = encode_and_condition(
        params, cfg, images, bank, k1, bank_nonempty, num_samples,
        dropout_key=dropout_key)

    sparse, dense = prompt_encode_nograd(params, cfg, coords, labels)
    image_pe = sam2_model.prompt_encoder.get_dense_pe(params["sam_prompt_encoder"], cfg)
    low_res, ious, _, _ = sam2_model.mask_decoder.mask_decoder_apply(
        params["sam_mask_decoder"], cfg, image_embed, image_pe,
        sparse, dense, multimask_output=multimask_output,
        high_res_features=high_res,
        dynamic_multimask_via_stability=is_eval,
    )
    iou_best = jnp.max(ious, axis=1)

    pred = layers.interpolate(
        low_res.astype(jnp.float32).transpose(0, 2, 3, 1),
        (rcfg.out_size, rcfg.out_size), method="bilinear")[:, :, :, 0]

    # memory encoder on thresholded prediction (func_2d/function.py:180-191)
    high_res_bin = (pred > 0).astype(jnp.float32)[:, None]
    maskmem_features, _ = sam2_model.encode_new_memory(
        params, cfg, vision_feats[-1],
        layers.interpolate(high_res_bin.transpose(0, 2, 3, 1),
                           (cfg.image_size, cfg.image_size),
                           method="bilinear").transpose(0, 3, 1, 2),
        is_mask_from_pts=True)
    bank = sb.write_similarity_bank(
        bank,
        jax.lax.stop_gradient(maskmem_features),
        jax.lax.stop_gradient(jnp.mean(iou_best)),
        jax.lax.stop_gradient(image_embed.reshape(B, -1).astype(jnp.float32)),
    )
    return pred, iou_best, bank, {"low_res": low_res}


def prompt_encode_nograd(params, cfg, coords, labels):
    sparse, dense = sam2_model.prompt_encoder.prompt_encoder_apply(
        params["sam_prompt_encoder"], cfg, points=(coords, labels))
    return jax.lax.stop_gradient(sparse), jax.lax.stop_gradient(dense)


def make_train_step_2d(cfg: SAM2Config, rcfg: Recipe2DConfig, tx):
    """REFUGE-style SAM-only click training step.

    batch: images [B, S, S, 3], coords [B, P, 2], labels [B, P],
    gt_masks [B, out, out]."""

    def loss_fn(params, batch, bank, key, bank_nonempty):
        # the reference trains with dropout active (memory_attention.py:33-99);
        # the bank-sampling and dropout streams split from the step key
        key, dk = jax.random.split(key)
        pred, iou_pred, bank, _ = forward_2d(
            params, cfg, rcfg, batch["images"], batch["coords"], batch["labels"],
            bank, key, bank_nonempty, dropout_key=dk)
        gt = batch["gt_masks"]
        bce = bce_with_logits(pred, gt, rcfg.pos_weight).mean()
        dsc = dice_loss(pred, gt).mean()
        actual_iou = iou_between((pred > 0).astype(jnp.float32), gt)
        iou_l = jnp.mean((iou_pred - jax.lax.stop_gradient(actual_iou)) ** 2)
        loss = bce + dsc + rcfg.iou_loss_weight * iou_l
        return loss, (bank, {"loss": loss, "bce": bce, "dice": dsc, "iou_mse": iou_l})

    def train_step(params, opt_state, batch, bank, key, bank_nonempty: bool):
        (loss, (bank, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, bank, key, bank_nonempty)
        if rcfg.clip_grad > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, rcfg.clip_grad / jnp.maximum(gnorm, 1e-9))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, bank, metrics

    return train_step


def make_optimizer_2d(rcfg: Recipe2DConfig):
    return optax.adamw(rcfg.lr, weight_decay=rcfg.weight_decay)

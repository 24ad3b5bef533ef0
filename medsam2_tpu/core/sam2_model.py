"""SAM2 model assembly: the pure-function equivalent of ``SAM2Base``
(``sam2_train/modeling/sam2_base.py``).

Everything is a pure function of (params, config, inputs, memory-bank pytree):
``forward_image`` runs the encoder; ``forward_sam_heads`` runs prompt encoder +
mask decoder with occlusion handling; ``track_step`` fuses the current frame
with the ring-buffer memory bank (read), applies the SAM heads, and encodes the
new memory (write). Video propagation is ``lax.scan`` of ``track_step`` over
frames (see ``api/video_predictor.py``).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config
from medsam2_tpu.core import layers, mask_decoder, memory, prompt_encoder
from medsam2_tpu.core.image_encoder import image_encoder_apply, image_encoder_init
from medsam2_tpu.core.memory import (
    memory_attention_apply,
    memory_attention_init,
    memory_encoder_apply,
    memory_encoder_init,
)
from medsam2_tpu.core.pos_enc import sine_pos_embed
from medsam2_tpu.state import memory_bank as mb

# Placeholder score for missing objects (sam2_base.py:18-19)
NO_OBJ_SCORE = -1024.0


def sam2_init(key, cfg: SAM2Config):
    ks = jax.random.split(key, 12)
    params = {
        "image_encoder": image_encoder_init(ks[0], cfg),
        "sam_prompt_encoder": prompt_encoder.prompt_encoder_init(ks[1], cfg),
        "sam_mask_decoder": mask_decoder.mask_decoder_init(ks[2], cfg),
        "memory_attention": memory_attention_init(ks[3], cfg.memory_attention),
        "memory_encoder": memory_encoder_init(ks[4], cfg.memory_encoder),
        "maskmem_tpos_enc": layers.trunc_normal(ks[5], (cfg.num_maskmem, cfg.mem_dim)),
        "no_mem_embed": layers.trunc_normal(ks[6], (1, 1, cfg.hidden_dim)),
        "no_mem_pos_enc": layers.trunc_normal(ks[7], (1, 1, cfg.hidden_dim)),
    }
    if cfg.use_obj_ptrs_in_encoder:
        params["mask_downsample"] = layers.conv2d_init(ks[8], 1, 1, (4, 4))
        if cfg.use_mlp_for_obj_ptr_proj:
            params["obj_ptr_proj"] = layers.mlp_init(
                ks[9], cfg.hidden_dim, cfg.hidden_dim, cfg.hidden_dim, 3)
        else:
            params["obj_ptr_proj"] = layers.linear_init(ks[9], cfg.hidden_dim, cfg.hidden_dim)
    if cfg.proj_tpos_enc_in_obj_ptrs:
        params["obj_ptr_tpos_proj"] = layers.linear_init(ks[10], cfg.hidden_dim, cfg.mem_dim)
    if cfg.pred_obj_scores and cfg.use_obj_ptrs_in_encoder:
        params["no_obj_ptr"] = layers.trunc_normal(ks[11], (1, cfg.hidden_dim))
    return params


# ---------------------------------------------------------------------------
# Image features
# ---------------------------------------------------------------------------


def forward_image(params, cfg: SAM2Config, img_batch: jnp.ndarray,
                  trunk_pos_embed=None) -> Dict:
    """Encode images; precompute the decoder's high-res skip projections
    (``sam2_base.py:464-476``). img_batch: [B, H, W, 3] NHWC."""
    backbone_out = image_encoder_apply(params["image_encoder"], cfg, img_batch,
                                       trunk_pos_embed=trunk_pos_embed)
    if cfg.use_high_res_features_in_sam:
        dec = params["sam_mask_decoder"]
        fpn = list(backbone_out["backbone_fpn"])
        fpn[0] = layers.conv2d_apply(dec["conv_s0"], fpn[0], explicit_padding=(0, 0))
        fpn[1] = layers.conv2d_apply(dec["conv_s1"], fpn[1], explicit_padding=(0, 0))
        backbone_out["backbone_fpn"] = fpn
    return backbone_out


def prepare_backbone_features(cfg: SAM2Config, backbone_out: Dict):
    """Keep the last ``num_feature_levels`` levels (``sam2_base.py:478-492``).
    Features stay NHWC (batch-first; the reference flattens to (HW)NC)."""
    feats = backbone_out["backbone_fpn"][-cfg.num_feature_levels:]
    pos = backbone_out["vision_pos_enc"][-cfg.num_feature_levels:]
    sizes = [(f.shape[1], f.shape[2]) for f in feats]
    return feats, pos, sizes


# ---------------------------------------------------------------------------
# SAM heads
# ---------------------------------------------------------------------------


class SamHeadOutputs(NamedTuple):
    low_res_multimasks: jnp.ndarray   # [B, M, h4, w4]
    high_res_multimasks: jnp.ndarray  # [B, M, H, W]
    ious: jnp.ndarray                 # [B, M]
    low_res_masks: jnp.ndarray        # [B, 1, h4, w4]
    high_res_masks: jnp.ndarray       # [B, 1, H, W]
    obj_ptr: jnp.ndarray              # [B, C]
    object_score_logits: jnp.ndarray  # [B, 1]


def forward_sam_heads(
    params,
    cfg: SAM2Config,
    backbone_features: jnp.ndarray,   # [B, h, w, C]
    point_inputs: Optional[Dict] = None,   # {"point_coords" [B,P,2], "point_labels" [B,P]}
    mask_inputs: Optional[jnp.ndarray] = None,  # [B, H, W, 1]
    high_res_features: Optional[List[jnp.ndarray]] = None,
    multimask_output: bool = False,
    image_indices: Optional[jnp.ndarray] = None,
    eval_dynamic_multimask: bool = False,
) -> SamHeadOutputs:
    """``SAM2Base._forward_sam_heads`` (``sam2_base.py:252-410``)."""
    B = backbone_features.shape[0]

    if point_inputs is not None:
        coords = point_inputs["point_coords"]
        labels = point_inputs["point_labels"]
    else:
        coords = jnp.zeros((B, 1, 2), jnp.float32)
        labels = -jnp.ones((B, 1), jnp.int32)

    if mask_inputs is not None:
        ms = cfg.sam_image_embedding_size * 4
        if mask_inputs.shape[1] != ms:
            sam_mask_prompt = layers.interpolate(
                mask_inputs.astype(jnp.float32), (ms, ms), method="bilinear", antialias=True)
        else:
            sam_mask_prompt = mask_inputs.astype(jnp.float32)
    else:
        sam_mask_prompt = None

    sparse, dense = prompt_encoder.prompt_encoder_apply(
        params["sam_prompt_encoder"], cfg,
        points=(coords, labels), masks=sam_mask_prompt,
    )
    image_pe = prompt_encoder.get_dense_pe(params["sam_prompt_encoder"], cfg)
    low_res_multimasks, ious, sam_output_tokens, object_score_logits = (
        mask_decoder.mask_decoder_apply(
            params["sam_mask_decoder"], cfg,
            image_embeddings=backbone_features,
            image_pe=image_pe,
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=multimask_output,
            high_res_features=high_res_features,
            image_indices=image_indices,
            dynamic_multimask_via_stability=eval_dynamic_multimask,
        )
    )

    if cfg.pred_obj_scores:
        is_obj_appearing = object_score_logits > 0  # [N, 1]
        # Hard choice between obj/no-obj for spatial memories (sam2_base.py:354-363)
        low_res_multimasks = jnp.where(
            is_obj_appearing[:, :, None, None], low_res_multimasks, NO_OBJ_SCORE)

    low_res_multimasks = low_res_multimasks.astype(jnp.float32)

    def upsample(masks):
        # NHWC resize expects channels-last; masks are [B, M, h, w]
        return layers.interpolate(
            masks.transpose(0, 2, 3, 1), (cfg.image_size, cfg.image_size),
            method="bilinear",
        ).transpose(0, 3, 1, 2)

    sam_output_token = sam_output_tokens[:, 0]
    if multimask_output:
        best = jnp.argmax(ious, axis=-1)
        bidx = jnp.arange(B)
        low_res_masks = low_res_multimasks[bidx, best][:, None]
        if sam_output_tokens.shape[1] > 1:
            sam_output_token = sam_output_tokens[bidx, best]
        # Select BEFORE upsampling: the resize is per-mask independent, so
        # upsampling only the argmax-IoU mask is exact and avoids resizing
        # num_multimask_outputs full-res maps per frame (the reference
        # interpolates all, sam2_base.py:364-371); the all-mask field below is
        # the same values and dead-code-eliminated when unused.
        high_res_masks = upsample(low_res_masks)
        high_res_multimasks = upsample(low_res_multimasks)
    else:
        low_res_masks = low_res_multimasks
        high_res_masks = high_res_multimasks = upsample(low_res_multimasks)

    # Object pointer with occlusion handling (sam2_base.py:387-400)
    if cfg.use_obj_ptrs_in_encoder:
        if cfg.use_mlp_for_obj_ptr_proj:
            obj_ptr = layers.mlp_apply(params["obj_ptr_proj"], sam_output_token)
        else:
            obj_ptr = layers.linear_apply(params["obj_ptr_proj"], sam_output_token)
    else:
        obj_ptr = sam_output_token
    if cfg.pred_obj_scores:
        if cfg.soft_no_obj_ptr:
            lam = jax.nn.sigmoid(object_score_logits)
        else:
            lam = (object_score_logits > 0).astype(obj_ptr.dtype)
        if cfg.fixed_no_obj_ptr:
            obj_ptr = lam * obj_ptr
        obj_ptr = obj_ptr + (1.0 - lam) * params["no_obj_ptr"].astype(obj_ptr.dtype)

    return SamHeadOutputs(low_res_multimasks, high_res_multimasks, ious,
                          low_res_masks, high_res_masks, obj_ptr, object_score_logits)


def use_mask_as_output(params, cfg: SAM2Config, backbone_features, high_res_features,
                       mask_inputs) -> SamHeadOutputs:
    """Directly turn a binary mask input into output logits (+/-10 passthrough,
    ``sam2_base.py:412-462``). mask_inputs: [B, H, W, 1]."""
    out_scale, out_bias = 20.0, -10.0
    mask_f = mask_inputs.astype(jnp.float32)
    high_res_masks = (mask_f * out_scale + out_bias).transpose(0, 3, 1, 2)  # [B,1,H,W]
    H, W = mask_f.shape[1], mask_f.shape[2]
    low_res_masks = layers.interpolate(
        mask_f * out_scale + out_bias, (H // 4, W // 4), method="bilinear", antialias=True,
    ).transpose(0, 3, 1, 2)
    B = mask_f.shape[0]
    ious = jnp.ones((B, 1), jnp.float32)

    if not cfg.use_obj_ptrs_in_encoder:
        obj_ptr = jnp.zeros((B, cfg.hidden_dim), jnp.float32)
    else:
        down = layers.conv2d_apply(params["mask_downsample"], mask_f, stride=(4, 4),
                                   explicit_padding=(0, 0))
        obj_ptr = forward_sam_heads(
            params, cfg, backbone_features,
            mask_inputs=down, high_res_features=high_res_features,
        ).obj_ptr

    is_obj_appearing = jnp.any(mask_f.reshape(B, -1) > 0.0, axis=1)[:, None]
    lam = is_obj_appearing.astype(jnp.float32)
    object_score_logits = out_scale * lam + out_bias
    if cfg.pred_obj_scores:
        if cfg.fixed_no_obj_ptr:
            obj_ptr = lam * obj_ptr
        obj_ptr = obj_ptr + (1.0 - lam) * params["no_obj_ptr"].astype(obj_ptr.dtype)

    return SamHeadOutputs(low_res_masks, high_res_masks, ious,
                          low_res_masks, high_res_masks, obj_ptr, object_score_logits)


# ---------------------------------------------------------------------------
# Memory
# ---------------------------------------------------------------------------


def encode_new_memory(params, cfg: SAM2Config, pix_feat: jnp.ndarray,
                      pred_masks_high_res: jnp.ndarray, is_mask_from_pts,
                      binarize: bool = False, apply_non_overlap: bool = False):
    """``SAM2Base._encode_new_memory`` (``sam2_base.py:665-703``).

    pix_feat: [B, h, w, C]; pred_masks_high_res: [B, 1, H, W] logits.
    ``is_mask_from_pts`` may be a static bool or a per-object [B] bool array
    (a conditioning frame can mix point- and mask-prompted objects; only the
    point-prompted ones binarize, ``sam2_base.py:676-681``).
    Returns (maskmem_features [B, h*w, D], spatial pos [h*w, D])."""
    masks = pred_masks_high_res.transpose(0, 2, 3, 1)  # [B, H, W, 1]
    if apply_non_overlap:
        masks = apply_non_overlapping_constraints(
            masks.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
    if binarize and cfg.binarize_mask_from_pts_for_mem_enc:
        binarized = (masks > 0).astype(jnp.float32)
        sig = jax.nn.sigmoid(masks)
        if isinstance(is_mask_from_pts, bool):
            mask_for_mem = binarized if is_mask_from_pts else sig
        else:
            sel = jnp.asarray(is_mask_from_pts).reshape(-1, 1, 1, 1)
            mask_for_mem = jnp.where(sel, binarized, sig)
    else:
        mask_for_mem = jax.nn.sigmoid(masks)
    mask_for_mem = mask_for_mem * cfg.sigmoid_scale_for_mem_enc + cfg.sigmoid_bias_for_mem_enc

    # The memory encoder runs in the compute dtype (the reference runs under
    # bf16 autocast; the mask downsampler convs at full image resolution are
    # bandwidth-bound, so fp32 would double their HBM traffic)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    feats, pos = memory_encoder_apply(
        params["memory_encoder"], cfg.memory_encoder,
        pix_feat.astype(dt), mask_for_mem.astype(dt), skip_mask_sigmoid=True,
    )
    B, h, w, D = feats.shape
    return feats.reshape(B, h * w, D), pos.reshape(h * w, D)


def prepare_memory_conditioned_features(
    params,
    cfg: SAM2Config,
    spec: mb.BankSpec,
    bank,
    frame_idx,
    is_init_cond_frame: bool,
    current_vision_feats: jnp.ndarray,   # [B, h, w, C] top level
    current_vision_pos: jnp.ndarray,     # [B, h, w, C]
    track_in_reverse: bool = False,
    num_frames: int = 2 ** 30,
    is_eval: bool = False,
    dropout_key=None,
    pos_kcache=None,
    kv_storage: bool = False,
) -> jnp.ndarray:
    """``SAM2Base._prepare_memory_conditioned_features`` (``sam2_base.py:494-663``)
    against the fixed-shape bank. Returns [B, h, w, C]. ``dropout_key``
    activates the memory-attention training dropout (rate 0.1 in the reference,
    ``memory_attention.py:33-99``); None = deterministic inference.

    ``pos_kcache`` [Fa, L, P, d_model]: the session-static positional half of
    the roped-key cache (hoisted out of the propagation scan); requires a bank
    built with kcache slots.

    ``kv_storage``: consume the cache in storage order (no recency gather —
    the hot eval-scan path; see ``memory_bank.kv_storage_layout``). The
    read-order ``k_cache`` form stays for vmapped callers (batched volume
    streaming), whose per-volume scalar-prefetch indices the storage kernel
    cannot batch."""
    B, h, w, C = current_vision_feats.shape
    curr = current_vision_feats.reshape(B, h * w, C)
    curr_pos = current_vision_pos.reshape(B, h * w, C).astype(curr.dtype)

    if cfg.num_maskmem == 0:
        return current_vision_feats

    if is_init_cond_frame:
        if cfg.directly_add_no_mem_embed:
            out = curr + params["no_mem_embed"].astype(curr.dtype)
            return out.reshape(B, h, w, C)
        memory_tokens = jnp.broadcast_to(
            params["no_mem_embed"].astype(curr.dtype), (B, 1, C))
        memory_pos = jnp.broadcast_to(
            params["no_mem_pos_enc"].astype(curr.dtype), (B, 1, C))
        out = memory_attention_apply(
            params["memory_attention"], cfg.memory_attention,
            curr, memory_tokens, curr_pos, memory_pos, q_hw=(w, h),
            num_obj_ptr_tokens=0, dropout_key=dropout_key,
        )
        return out.reshape(B, h, w, C)

    if kv_storage and pos_kcache is not None and "kcache" in bank:
        return _memory_conditioned_features_storage(
            params, cfg, spec, bank, frame_idx, curr, curr_pos, (w, h),
            track_in_reverse=track_in_reverse, num_frames=num_frames,
            is_eval=is_eval, dropout_key=dropout_key, pos_kcache=pos_kcache,
        ).reshape(B, h, w, C)

    mem_h = cfg.sam_image_embedding_size
    spatial_pos = sine_pos_embed(mem_h, mem_h, cfg.mem_dim)
    memory_tokens, memory_pos, valid, num_ptr_tokens, ptr_tdiff = mb.read_bank(
        spec, bank, frame_idx,
        params["maskmem_tpos_enc"],
        spatial_pos.reshape(-1, cfg.mem_dim),
        track_in_reverse=track_in_reverse,
        obj_ptrs_in_past_only=(cfg.only_obj_ptrs_in_the_past_for_eval and is_eval),
        num_frames=num_frames,
    )
    if cfg.use_obj_ptrs_in_encoder and cfg.add_tpos_enc_to_obj_ptrs:
        # Temporal sine encoding of pointer distances, normalized by the max
        # pointer reach; projected to mem_dim when configured
        # (``sam2_base.py:617-634``).
        from medsam2_tpu.core.pos_enc import get_1d_sine_pe

        eff_max_ptrs = min(int(num_frames), cfg.max_obj_ptrs_in_encoder)
        t_diff_max = max(eff_max_ptrs - 1, 1)
        tpos_dim = cfg.hidden_dim if cfg.proj_tpos_enc_in_obj_ptrs else cfg.mem_dim
        obj_pos = get_1d_sine_pe(ptr_tdiff.astype(jnp.float32) / t_diff_max, tpos_dim)
        if cfg.proj_tpos_enc_in_obj_ptrs:
            obj_pos = layers.linear_apply(params["obj_ptr_tpos_proj"], obj_pos)
        obj_pos = jnp.repeat(obj_pos, spec.tokens_per_ptr, axis=1)   # [B, Nt, D]
        memory_pos = jnp.concatenate(
            [memory_pos[:, : spec.num_spatial_tokens],
             obj_pos.astype(memory_pos.dtype)], axis=1)
    if not cfg.use_obj_ptrs_in_encoder:
        memory_tokens = memory_tokens[:, : spec.num_spatial_tokens]
        memory_pos = memory_pos[:, : spec.num_spatial_tokens]
        valid = valid[:, : spec.num_spatial_tokens]
        num_ptr_tokens = 0

    k_cache = None
    if pos_kcache is not None and "kcache" in bank:
        k_cache = (mb.read_kcache(spec, bank, frame_idx,
                                  track_in_reverse=track_in_reverse),
                   pos_kcache)

    out = memory_attention_apply(
        params["memory_attention"], cfg.memory_attention,
        curr, memory_tokens.astype(curr.dtype), curr_pos, memory_pos.astype(curr.dtype),
        q_hw=(w, h), num_obj_ptr_tokens=num_ptr_tokens, kv_mask=valid,
        dropout_key=dropout_key, k_cache=k_cache,
    )
    return out.reshape(B, h, w, C)


def _memory_conditioned_features_storage(
    params, cfg: SAM2Config, spec: mb.BankSpec, bank, frame_idx,
    curr, curr_pos, q_hw, *, track_in_reverse, num_frames, is_eval,
    dropout_key, pos_kcache,
):
    """Storage-order memory readout: cross-attention consumes the bank's
    roped-key cache AS STORED (cond slots then the ring), with per-slot
    positional rows + validity from :func:`memory_bank.kv_storage_layout` —
    the recency reordering the reference materializes (``sam2_base.py:529-564``)
    reduces to index arithmetic (attention is permutation-invariant over kv).
    Returns [B, Nq, C]."""
    B = curr.shape[0]
    P = spec.mem_spatial
    frame_idx = jnp.asarray(frame_idx, jnp.int32)

    ptr_tokens, ptr_valid, ptr_tdiff = mb.read_ptrs(
        spec, bank, frame_idx, track_in_reverse=track_in_reverse,
        obj_ptrs_in_past_only=(cfg.only_obj_ptrs_in_the_past_for_eval and is_eval),
        num_frames=num_frames)
    if not cfg.use_obj_ptrs_in_encoder:
        ptr_valid = jnp.zeros_like(ptr_valid)
    if cfg.use_obj_ptrs_in_encoder and cfg.add_tpos_enc_to_obj_ptrs:
        from medsam2_tpu.core.pos_enc import get_1d_sine_pe

        eff_max_ptrs = min(int(num_frames), cfg.max_obj_ptrs_in_encoder)
        t_diff_max = max(eff_max_ptrs - 1, 1)
        tpos_dim = (cfg.hidden_dim if cfg.proj_tpos_enc_in_obj_ptrs
                    else cfg.mem_dim)
        obj_pos = get_1d_sine_pe(ptr_tdiff.astype(jnp.float32) / t_diff_max,
                                 tpos_dim)
        if cfg.proj_tpos_enc_in_obj_ptrs:
            obj_pos = layers.linear_apply(params["obj_ptr_tpos_proj"], obj_pos)
        ptr_pos = jnp.repeat(obj_pos, spec.tokens_per_ptr, axis=1)
    else:
        ptr_pos = jnp.zeros(ptr_tokens.shape, curr.dtype)

    row_of_slot, slot_valid = mb.kv_storage_layout(
        spec, bank, frame_idx, track_in_reverse=track_in_reverse)
    kv_mask = jnp.concatenate(
        [jnp.repeat(slot_valid, P, axis=1), ptr_valid], axis=1)
    v_slots = jnp.concatenate(
        [bank["cond_feats"], bank["noncond_feats"]], axis=1).astype(curr.dtype)

    bundle = {
        "kcache": bank["kcache"],
        "pos_rows": pos_kcache,
        "row_of_slot": row_of_slot,
        "v_slots": v_slots,
        "ptr_tokens": ptr_tokens.astype(curr.dtype),
        "ptr_pos": ptr_pos.astype(curr.dtype),
        "kv_mask": kv_mask,
        "force": None,
    }
    return memory_attention_apply(
        params["memory_attention"], cfg.memory_attention,
        curr, None, curr_pos, None, q_hw=q_hw,
        dropout_key=dropout_key, kv_bundle=bundle,
    )


def kcache_shape(cfg: SAM2Config) -> Tuple[int, int]:
    """(num_layers, d_model) for banks carrying the roped-key cache, or (0, 0)
    when the cache doesn't apply (no memory, or keys don't take positional
    encodings — the cache folds ``memory + pos`` linearity through RoPE)."""
    if cfg.num_maskmem <= 0 or not cfg.memory_attention.pos_enc_at_cross_attn_keys:
        return (0, 0)
    return (cfg.memory_attention.num_layers, cfg.memory_attention.d_model)


def kcache_dtype(cfg: SAM2Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def make_pos_kcache(params, cfg: SAM2Config, spec: mb.BankSpec) -> jnp.ndarray:
    """Session-static positional half of the roped-key cache [Fa, L, P, C].
    Depends only on params and bank geometry — compute once per session and
    pass into :func:`track_step` (hoisted out of the propagation scan)."""
    mem_h = cfg.sam_image_embedding_size
    spatial_pos = sine_pos_embed(mem_h, mem_h, cfg.mem_dim).reshape(-1, cfg.mem_dim)
    rows = mb.pos_kcache_rows(spec, params["maskmem_tpos_enc"], spatial_pos)
    return memory.precompute_pos_kcache(
        params["memory_attention"], cfg.memory_attention, rows, (mem_h, mem_h),
        dtype=kcache_dtype(cfg))


def apply_non_overlapping_constraints(pred_masks: jnp.ndarray) -> jnp.ndarray:
    """Keep only the highest-scoring object per pixel (``sam2_base.py:812-830``).
    pred_masks: [B_obj, 1, H, W]."""
    if pred_masks.shape[0] == 1:
        return pred_masks
    max_obj = jnp.argmax(pred_masks, axis=0, keepdims=True)
    batch_obj = jnp.arange(pred_masks.shape[0])[:, None, None, None]
    keep = max_obj == batch_obj
    return jnp.where(keep, pred_masks, jnp.clip(pred_masks, a_max=-10.0))


# ---------------------------------------------------------------------------
# track_step
# ---------------------------------------------------------------------------


def track_step(
    params,
    cfg: SAM2Config,
    spec: mb.BankSpec,
    bank,
    frame_idx,
    is_init_cond_frame: bool,
    current_vision_feats: List[jnp.ndarray],
    current_vision_pos: List[jnp.ndarray],
    point_inputs: Optional[Dict] = None,
    mask_inputs: Optional[jnp.ndarray] = None,
    multimask_output: bool = False,
    run_mem_encoder: bool = True,
    is_cond_frame: bool = False,
    track_in_reverse: bool = False,
    num_frames: int = 2 ** 30,
    is_eval: bool = False,
    prev_sam_mask_logits: Optional[jnp.ndarray] = None,
    dropout_key=None,
    pos_kcache=None,
    kv_storage: bool = False,
) -> Tuple[Dict, Dict]:
    """Single-frame pipeline (``sam2_base.py:705-800``): memory readout -> SAM
    heads -> memory write. Returns (outputs dict, updated bank).

    ``pos_kcache``: session-static positional roped keys — enables the bank's
    roped-key cache (the bank must carry kcache slots; the memory half of the
    cache for this frame is computed at write time below)."""
    high_res_features = (
        list(current_vision_feats[:-1]) if len(current_vision_feats) > 1 else None
    )

    if mask_inputs is not None and cfg.use_mask_input_as_output_without_sam:
        sam_outputs = use_mask_as_output(
            params, cfg, current_vision_feats[-1], high_res_features, mask_inputs)
    else:
        pix_feat_with_mem = prepare_memory_conditioned_features(
            params, cfg, spec, bank, frame_idx, is_init_cond_frame,
            current_vision_feats[-1], current_vision_pos[-1],
            track_in_reverse=track_in_reverse, num_frames=num_frames, is_eval=is_eval,
            dropout_key=dropout_key, pos_kcache=pos_kcache,
            kv_storage=kv_storage,
        )
        if prev_sam_mask_logits is not None:
            mask_inputs = prev_sam_mask_logits
        sam_outputs = forward_sam_heads(
            params, cfg, pix_feat_with_mem,
            point_inputs=point_inputs,
            mask_inputs=mask_inputs,
            high_res_features=high_res_features,
            multimask_output=multimask_output,
            eval_dynamic_multimask=is_eval,
        )

    out = {
        "pred_masks": sam_outputs.low_res_masks,
        "pred_masks_high_res": sam_outputs.high_res_masks,
        "obj_ptr": sam_outputs.obj_ptr,
        "ious": sam_outputs.ious,
        "object_score_logits": sam_outputs.object_score_logits,
    }

    if run_mem_encoder and cfg.num_maskmem > 0:
        maskmem_features, _ = encode_new_memory(
            params, cfg, current_vision_feats[-1], sam_outputs.high_res_masks,
            is_mask_from_pts=(point_inputs is not None),
            binarize=is_eval,
            apply_non_overlap=(cfg.non_overlap_masks_for_mem_enc and is_eval),
        )
        kcache = None
        if "kcache" in bank:
            mem_h = cfg.sam_image_embedding_size
            kcache = memory.precompute_memory_kcache(
                params["memory_attention"], cfg.memory_attention,
                maskmem_features, (mem_h, mem_h),
                dtype=bank["kcache"].dtype)
        bank = mb.write_bank(spec, bank, frame_idx, maskmem_features,
                             sam_outputs.obj_ptr, is_cond=is_cond_frame,
                             kcache=kcache)

    return out, bank


def use_multimask(cfg: SAM2Config, is_init_cond_frame: bool, num_pts: int) -> bool:
    """``SAM2Base._use_multimask`` (``sam2_base.py:802-810``); static decision."""
    return (
        cfg.multimask_output_in_sam
        and (is_init_cond_frame or cfg.multimask_output_for_tracking)
        and (cfg.multimask_min_pt_num <= num_pts <= cfg.multimask_max_pt_num)
    )

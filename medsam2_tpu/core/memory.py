"""Memory attention + memory encoder (rebuilds of
``sam2_train/modeling/memory_attention.py`` and ``memory_encoder.py``).

Memory attention: 4 layers of (RoPE self-attn over current-frame tokens, RoPE
cross-attn to the concatenated memory [spatial memories + object-pointer
tokens], FFN 2048). Operates batch-first [B, N, C] (the reference transposes
seq-first at the boundary, ``memory_attention.py:143-148``); memory slots carry
a validity mask so padding frames in the fixed-shape ring buffer never attend.

Memory encoder: sigmoid mask -> strided-conv MaskDownSampler (16x, channels
x4/step) + 1x1-projected pixel features -> 2 ConvNeXt CXBlocks -> 1x1 out
projection 256->64.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from medsam2_tpu.configs import MemoryAttentionConfig, MemoryEncoderConfig
from medsam2_tpu.core import layers
from medsam2_tpu.core.pos_enc import sine_pos_embed
from medsam2_tpu.core.transformer import (attn_init, rope_attn_apply,
                                           rope_attn_storage)


# ---------------------------------------------------------------------------
# Memory attention
# ---------------------------------------------------------------------------


def memory_attention_layer_init(key, cfg: MemoryAttentionConfig):
    d = cfg.d_model
    ks = jax.random.split(key, 4)
    return {
        "self_attn": attn_init(ks[0], d, cfg.self_attn_num_heads),
        "cross_attn_image": attn_init(ks[1], d, cfg.cross_attn_num_heads,
                                      kv_in_dim=cfg.kv_in_dim),
        "linear1": layers.linear_init(ks[2], d, cfg.dim_feedforward),
        "linear2": layers.linear_init(ks[3], cfg.dim_feedforward, d),
        "norm1": layers.layer_norm_init(d),
        "norm2": layers.layer_norm_init(d),
        "norm3": layers.layer_norm_init(d),
    }


def memory_attention_init(key, cfg: MemoryAttentionConfig):
    ks = jax.random.split(key, cfg.num_layers + 1)
    return {
        "layers": [memory_attention_layer_init(ks[i], cfg) for i in range(cfg.num_layers)],
        "norm": layers.layer_norm_init(cfg.d_model),
    }


def _dropout(x, rate: float, key):
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _memory_attention_layer_apply(
    p, cfg: MemoryAttentionConfig, tgt, memory, pos, query_pos,
    q_hw: Tuple[int, int], num_k_exclude_rope: int, kv_mask,
    dropout_key=None, k_cached=None, kv_bundle=None, layer_idx: int = 0,
):
    """One MemoryAttentionLayer (``memory_attention.py:58-99``). Residual
    dropout (rate ``cfg.dropout``) applies only when a ``dropout_key`` is
    given (training); inference is deterministic."""
    act = layers.ACTIVATIONS[cfg.activation]
    k1 = k2 = k3 = k4 = None
    if dropout_key is not None:
        k1, k2, k3, k4 = jax.random.split(dropout_key, 4)

    # Self-attention (pre-norm)
    tgt2 = layers.layer_norm_apply(p["norm1"], tgt)
    q = tgt2 + query_pos if cfg.pos_enc_at_attn else tgt2
    tgt2 = rope_attn_apply(p["self_attn"], q, q, tgt2, cfg.self_attn_num_heads,
                           q_hw=q_hw, rope_theta=cfg.rope_theta)
    tgt = tgt + _dropout(tgt2, cfg.dropout, k1)

    # Cross-attention to memory
    tgt2 = layers.layer_norm_apply(p["norm2"], tgt)
    q = tgt2 + query_pos if cfg.pos_enc_at_cross_attn_queries else tgt2
    if kv_bundle is not None:
        tgt2 = rope_attn_storage(
            p["cross_attn_image"], q, kv_bundle, layer_idx,
            cfg.cross_attn_num_heads, q_hw=q_hw, rope_theta=cfg.rope_theta,
            force=kv_bundle.get("force"),
        )
    else:
        k = memory + pos if cfg.pos_enc_at_cross_attn_keys else memory
        tgt2 = rope_attn_apply(
            p["cross_attn_image"], q, k, memory, cfg.cross_attn_num_heads,
            q_hw=q_hw, rope_theta=cfg.rope_theta, rope_k_repeat=True,
            num_k_exclude_rope=num_k_exclude_rope, kv_mask=kv_mask,
            k_cached=k_cached,
        )
    tgt = tgt + _dropout(tgt2, cfg.dropout, k2)

    # FFN (inner dropout after the activation, memory_attention.py:40,101-104)
    tgt2 = layers.layer_norm_apply(p["norm3"], tgt)
    tgt2 = layers.linear_apply(
        p["linear2"], _dropout(act(layers.linear_apply(p["linear1"], tgt2)),
                               cfg.dropout, k4))
    return tgt + _dropout(tgt2, cfg.dropout, k3)


def memory_attention_apply(
    p,
    cfg: MemoryAttentionConfig,
    curr: jnp.ndarray,          # [B, Nq, C] current-frame tokens
    memory: jnp.ndarray,        # [B, Nk, mem_dim] memory tokens (spatial + obj ptr)
    curr_pos: Optional[jnp.ndarray],
    memory_pos: jnp.ndarray,    # [B, Nk, mem_dim]
    q_hw: Tuple[int, int],
    num_obj_ptr_tokens: int = 0,
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Nk] True = valid slot
    dropout_key=None,
    k_cache=None,  # ([B, Fa, L, P, C] memory part, [Fa, L, P, C] pos part)
    kv_bundle=None,
) -> jnp.ndarray:
    """``MemoryAttention.forward`` (``memory_attention.py:119-169``).

    ``k_cache``: precomputed roped spatial keys as a (memory, positional)
    pair (see :func:`precompute_memory_kcache`); when given, each layer's
    cross-attention skips the k projection + RoPE over the long spatial
    memory — the per-layer slice + add fuses into the attention input.

    ``kv_bundle``: the storage-order form of the same cache (see
    :func:`medsam2_tpu.core.transformer.rope_attn_storage`); when given,
    ``memory``/``memory_pos``/``kv_mask`` may be None — every cross-attention
    input comes from the bundle, assembled blockwise in VMEM."""
    output = curr
    if cfg.pos_enc_at_input and curr_pos is not None:
        output = output + 0.1 * curr_pos
    keys = (jax.random.split(dropout_key, len(p["layers"]))
            if dropout_key is not None else [None] * len(p["layers"]))
    for li, (lp, lk) in enumerate(zip(p["layers"], keys)):
        k_cached = None
        if k_cache is not None and kv_bundle is None:
            mem_part, pos_part = k_cache
            kc = mem_part[:, :, li] + pos_part[None, :, li].astype(mem_part.dtype)
            k_cached = kc.reshape(kc.shape[0], -1, kc.shape[-1])
        output = _memory_attention_layer_apply(
            lp, cfg, output, memory, memory_pos, curr_pos, q_hw,
            num_obj_ptr_tokens, kv_mask, dropout_key=lk, k_cached=k_cached,
            kv_bundle=kv_bundle, layer_idx=li,
        )
    return layers.layer_norm_apply(p["norm"], output)


# ---------------------------------------------------------------------------
# Roped-key cache (write-time k projection + RoPE of memory tokens)
# ---------------------------------------------------------------------------


def precompute_memory_kcache(p, cfg: MemoryAttentionConfig,
                             feats: jnp.ndarray, q_hw: Tuple[int, int],
                             dtype=jnp.bfloat16) -> jnp.ndarray:
    """Per-layer roped k projections of one frame's memory features.

    feats [B, P, mem_dim] -> [B, L, P, d_model]. RoPE is linear, so the
    rotation of ``Wk (mem + pos) + b`` splits into this write-time memory part
    (no bias) plus a session-static positional part
    (:func:`precompute_pos_kcache`); spatial positions within a frame never
    change, so this is computed once per frame instead of once per tracked
    frame x layer (the reference re-ropes all memories every frame,
    ``transformer.py:288-315`` with ``rope_k_repeat``)."""
    from medsam2_tpu.core.transformer import roped_k_for_tokens

    ks = [roped_k_for_tokens(lp["cross_attn_image"], feats,
                             cfg.cross_attn_num_heads, q_hw, cfg.rope_theta,
                             with_bias=False).astype(dtype)
          for lp in p["layers"]]
    return jnp.stack(ks, axis=1)


def precompute_pos_kcache(p, cfg: MemoryAttentionConfig,
                          pos_rows: jnp.ndarray, q_hw: Tuple[int, int],
                          dtype=jnp.bfloat16) -> jnp.ndarray:
    """Session-static positional k contribution (with bias).

    pos_rows [Fa, P, mem_dim]: per read-order frame slot, the spatial sine
    embedding + that slot's (static) t_pos embedding. Returns
    [Fa, L, P, d_model] — added to the gathered write-time cache at read time.
    Depends only on params and the bank geometry, so callers hoist it out of
    the propagation scan."""
    from medsam2_tpu.core.transformer import roped_k_for_tokens

    ks = [roped_k_for_tokens(lp["cross_attn_image"], pos_rows,
                             cfg.cross_attn_num_heads, q_hw, cfg.rope_theta,
                             with_bias=True).astype(dtype)
          for lp in p["layers"]]
    return jnp.stack(ks, axis=1)


# ---------------------------------------------------------------------------
# Memory encoder
# ---------------------------------------------------------------------------


def _mask_downsampler_layout(cfg: MemoryEncoderConfig):
    import math
    num_layers = int(math.log2(cfg.mask_downsampler_total_stride)
                     // math.log2(cfg.mask_downsampler_stride))
    chans = [1]
    for _ in range(num_layers):
        chans.append(chans[-1] * cfg.mask_downsampler_stride ** 2)
    return num_layers, chans


def memory_encoder_init(key, cfg: MemoryEncoderConfig):
    num_layers, chans = _mask_downsampler_layout(cfg)
    ks = jax.random.split(key, num_layers + 4 + cfg.fuser_num_layers)
    kk = cfg.mask_downsampler_kernel
    p = {
        "mask_downsampler": [
            {
                "conv": layers.conv2d_init(ks[i], chans[i], chans[i + 1], (kk, kk)),
                "ln": layers.layer_norm_init(chans[i + 1]),
            }
            for i in range(num_layers)
        ],
        "mask_out_proj": layers.conv2d_init(ks[num_layers], chans[-1], cfg.in_dim, (1, 1)),
        "pix_feat_proj": layers.conv2d_init(ks[num_layers + 1], cfg.in_dim, cfg.in_dim, (1, 1)),
        "fuser": [
            _cx_block_init(ks[num_layers + 2 + i], cfg.in_dim, cfg)
            for i in range(cfg.fuser_num_layers)
        ],
    }
    if cfg.out_dim != cfg.in_dim:
        p["out_proj"] = layers.conv2d_init(ks[-1], cfg.in_dim, cfg.out_dim, (1, 1))
    return p


def _cx_block_init(key, dim: int, cfg: MemoryEncoderConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    kk = cfg.fuser_kernel_size
    return {
        "dwconv": layers.conv2d_init(k1, dim, dim, (kk, kk), groups=dim),
        "norm": layers.layer_norm_init(dim),
        "pwconv1": layers.linear_init(k2, dim, 4 * dim),
        "pwconv2": layers.linear_init(k3, 4 * dim, dim),
        "gamma": cfg.fuser_layer_scale_init * jnp.ones((dim,), jnp.float32),
    }


def _cx_block_apply(p, cfg: MemoryEncoderConfig, x):
    """ConvNeXt block (``memory_encoder.py:62-117``), NHWC."""
    inp = x
    x = layers.conv2d_apply(p["dwconv"], x, explicit_padding=(cfg.fuser_padding,) * 2,
                            groups=x.shape[-1])
    x = layers.layer_norm_2d_apply(p["norm"], x)
    x = layers.linear_apply(p["pwconv1"], x)
    x = layers.gelu(x)
    x = layers.linear_apply(p["pwconv2"], x)
    x = p["gamma"].astype(x.dtype) * x
    return inp + x


def memory_encoder_apply(
    p,
    cfg: MemoryEncoderConfig,
    pix_feat: jnp.ndarray,   # [B, H, W, in_dim]
    masks: jnp.ndarray,      # [B, H*16, W*16, 1] (already sigmoided by the caller)
    skip_mask_sigmoid: bool = True,
):
    """Returns (vision_features [B, H, W, out_dim], vision_pos_enc [H, W, out_dim])
    (``memory_encoder.py:158-181``)."""
    if not skip_mask_sigmoid:
        masks = jax.nn.sigmoid(masks)
    x = masks
    stride = cfg.mask_downsampler_stride
    pad = cfg.mask_downsampler_padding
    for lp in p["mask_downsampler"]:
        if (stride == 2 and pad == 1 and lp["conv"]["w"].shape[:2] == (3, 3)
                and x.shape[1] % 2 == 0 and x.shape[2] % 4 == 0):
            # tiny-channel strided convs at image resolution are layout-bound;
            # the width-folded lowering is ~10x faster (layers.conv3s2_wfold)
            x = layers.conv3s2_wfold(lp["conv"], x)
        else:
            x = layers.conv2d_apply(lp["conv"], x, stride=(stride, stride),
                                    explicit_padding=(pad, pad))
        x = layers.layer_norm_2d_apply(lp["ln"], x)
        x = layers.gelu(x)
    x = layers.conv2d_apply(p["mask_out_proj"], x, explicit_padding=(0, 0))

    feats = layers.conv2d_apply(p["pix_feat_proj"], pix_feat, explicit_padding=(0, 0))
    feats = feats + x
    for fp in p["fuser"]:
        feats = _cx_block_apply(fp, cfg, feats)
    if "out_proj" in p:
        feats = layers.conv2d_apply(p["out_proj"], feats, explicit_padding=(0, 0))

    h, w = feats.shape[1], feats.shape[2]
    pos = sine_pos_embed(h, w, cfg.num_pos_feats).astype(feats.dtype)
    return feats, pos

"""Projection attention + two-way transformer (rebuild of
``sam2_train/modeling/sam/transformer.py``).

``attn_apply`` is the reference's ``Attention`` (q/k/v/out projections with an
optional internal downsample); ``rope_attn_apply`` adds axial RoPE with the
``rope_k_repeat`` (tile per memory frame) and ``num_k_exclude_rope`` (skip
object-pointer tokens) behaviours used by memory attention. The actual SDPA
goes through :func:`medsam2_tpu.ops.attention.attention` (Pallas flash on TPU
for long sequences; the reference force-disabled flash, ``transformer.py:22-25``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from medsam2_tpu.core import layers
from medsam2_tpu.core.pos_enc import apply_rope, axial_rope_cos_sin
from medsam2_tpu.ops.attention import attention


def attn_init(key, embedding_dim: int, num_heads: int, downsample_rate: int = 1,
              kv_in_dim: Optional[int] = None):
    internal = embedding_dim // downsample_rate
    kv_in = kv_in_dim if kv_in_dim is not None else embedding_dim
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q_proj": layers.linear_init(k1, embedding_dim, internal),
        "k_proj": layers.linear_init(k2, kv_in, internal),
        "v_proj": layers.linear_init(k3, kv_in, internal),
        "out_proj": layers.linear_init(k4, internal, embedding_dim),
    }


def _split_heads(x, num_heads):
    B, N, C = x.shape
    return x.reshape(B, N, num_heads, C // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, N, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * D)


def attn_apply(p, q, k, v, num_heads: int, kv_mask=None):
    """q [B, Nq, Cq], k/v [B, Nk, Ckv] -> [B, Nq, Cq] (``transformer.py:239-263``)."""
    qp = _split_heads(layers.linear_apply(p["q_proj"], q), num_heads)
    kp = _split_heads(layers.linear_apply(p["k_proj"], k), num_heads)
    vp = _split_heads(layers.linear_apply(p["v_proj"], v), num_heads)
    out = attention(qp, kp, vp, kv_mask=kv_mask)
    return layers.linear_apply(p["out_proj"], _merge_heads(out))


import functools
import numpy as np


@functools.lru_cache(maxsize=16)
def _rope_half_perm(C: int, num_heads: int) -> np.ndarray:
    """Per-head even-then-odd channel permutation: folds the interleaved RoPE
    pairing (x[2i], x[2i+1]) into a half-split layout."""
    hd = C // num_heads
    base = np.concatenate([np.arange(0, hd, 2), np.arange(1, hd, 2)])
    return np.concatenate([h * hd + base for h in range(num_heads)])


def _linear_perm(p, x, perm):
    """linear_apply with output channels permuted (folded into the weights —
    a [C] gather on the parameter, not on the activations)."""
    w = jnp.take(p["w"], perm, axis=1)
    y = jnp.matmul(x, w.astype(x.dtype), precision=layers.PRECISION)
    if "b" in p:
        y = y + p["b"][perm].astype(x.dtype)
    return y


def _apply_rope_half(x, cos, sin, repeat: int = 1):
    """RoPE on half-split channels: x [..., N, D] where the real/imag pair is
    (x[..., i], x[..., D/2+i]) — contiguous slices, no stride-2 gathers.
    Exactly ``apply_rope`` after the ``_rope_half_perm`` channel permutation."""
    orig_dtype = x.dtype
    hd = x.shape[-1]
    xf = x.astype(jnp.float32)
    xr, xi = xf[..., : hd // 2], xf[..., hd // 2:]
    if repeat > 1:
        cos = jnp.tile(cos, (repeat, 1))
        sin = jnp.tile(sin, (repeat, 1))
    out = jnp.concatenate([xr * cos - xi * sin, xr * sin + xi * cos], axis=-1)
    return out.astype(orig_dtype)


def roped_k_for_tokens(p_attn, tokens, num_heads: int, q_hw: Tuple[int, int],
                       rope_theta: float = 10000.0, with_bias: bool = False):
    """Project ``tokens`` [B, P, Dkv] through the (permuted) k projection and
    apply the within-frame axial RoPE rotation. P must equal w*h of ``q_hw``
    (one memory frame). Returns [B, P, C_int] in half-split channel layout —
    the exact per-frame k contribution :func:`rope_attn_apply` would compute.

    Used by the memory-bank roped-key cache: RoPE is linear, so
    ``rope(Wk(mem + pos) + b) == rope(Wk mem) + rope(Wk pos + b)`` — the
    memory part is computed once at bank-write time (``with_bias=False``) and
    the positional part once per session (``with_bias=True``), instead of
    re-projecting + re-rotating ~29k kv tokens in every frame and layer
    (cf. ``rope_k_repeat``, reference ``transformer.py:288-315``)."""
    C_int = p_attn["k_proj"]["w"].shape[1]
    perm = jnp.asarray(_rope_half_perm(C_int, num_heads))
    if with_bias:
        kp = _linear_perm(p_attn["k_proj"], tokens, perm)
    else:
        w = jnp.take(p_attn["k_proj"]["w"], perm, axis=1)
        kp = jnp.matmul(tokens, w.astype(tokens.dtype), precision=layers.PRECISION)
    B, P, _ = kp.shape
    head_dim = C_int // num_heads
    kp = kp.reshape(B, P, num_heads, head_dim).transpose(0, 2, 1, 3)
    gw, gh = q_hw
    cos, sin = axial_rope_cos_sin(head_dim, gw, gh, rope_theta)
    kp = _apply_rope_half(kp, cos, sin)
    return kp.transpose(0, 2, 1, 3).reshape(B, P, C_int)


def rope_attn_storage(p, q, bundle, layer: int, num_heads: int, *,
                      q_hw: Tuple[int, int], rope_theta: float = 10000.0,
                      force: Optional[str] = None):
    """Memory cross-attention against the bank's roped-key cache in STORAGE
    order (no recency gather / per-layer pos adds / ptr concat in HBM — see
    ``ops.attention.kv_cached_attention``). Single kv head, low-rank values.

    ``bundle``: kcache [B, F, L, P, C] (bank buffer as stored), pos_rows
    [Rr, L, P, C], row_of_slot [F], ptr_tokens/ptr_pos [B, Nptr, D],
    kv_mask [B, F*P + Nptr]."""
    from medsam2_tpu.ops.attention import kv_cached_attention

    if num_heads != 1:
        raise NotImplementedError("storage-order kv cache assumes 1 kv head")
    C_int = p["q_proj"]["w"].shape[1]
    v_in = p["v_proj"]["w"].shape[0]
    if v_in >= C_int // num_heads:
        raise NotImplementedError("storage-order kv cache assumes low-rank v")
    perm = jnp.asarray(_rope_half_perm(C_int, num_heads))
    qp = _split_heads(_linear_perm(p["q_proj"], q, perm), num_heads)
    w, h = q_hw
    cos, sin = axial_rope_cos_sin(qp.shape[-1], w, h, rope_theta)
    qp = _apply_rope_half(qp, cos, sin)[:, 0]             # [B, Nq, C]

    ptr_in = bundle["ptr_tokens"] + bundle["ptr_pos"]
    ptr_k = _linear_perm(p["k_proj"], ptr_in.astype(q.dtype), perm)

    out = kv_cached_attention(
        qp, bundle["kcache"], bundle["pos_rows"], bundle["row_of_slot"],
        ptr_k, bundle["v_slots"], bundle["ptr_tokens"].astype(q.dtype),
        bundle["kv_mask"], layer, force=force)             # [B, Nq, Dv]

    wv = p["v_proj"]["w"].astype(out.dtype)
    out = jnp.matmul(out, wv, precision=layers.PRECISION)
    if "b" in p["v_proj"]:
        out = out + p["v_proj"]["b"].astype(out.dtype)
    return layers.linear_apply(p["out_proj"], out)


def rope_attn_apply(p, q, k, v, num_heads: int, *, q_hw: Tuple[int, int],
                    rope_theta: float = 10000.0, rope_k_repeat: bool = False,
                    num_k_exclude_rope: int = 0, kv_mask=None,
                    k_cached: Optional[jnp.ndarray] = None):
    """RoPE attention (``transformer.py:266-331``).

    ``q_hw``: the (w, h) spatial extent of the query tokens (row-major). The
    last ``num_k_exclude_rope`` k tokens (object pointers) skip rotation; when
    ``rope_k_repeat`` the q-grid tables tile across the k spatial tokens
    (one tile per memory frame).

    TPU layout: the interleaved-pair rotation is rewritten as a half-split
    rotation by permuting the q/k projection output channels (a shared channel
    permutation of q and k leaves QK^T unchanged; v and the output projection
    are untouched). This removes stride-2 channel gathers on the long memory
    k tensor.

    ``k_cached`` [B, num_k_rope, C_int]: precomputed roped spatial keys (from
    the bank's roped-key cache, already projected/permuted/rotated); only the
    trailing ``num_k_exclude_rope`` pointer tokens of ``k`` are then projected
    here.
    """
    C_int = p["q_proj"]["w"].shape[1]
    perm = jnp.asarray(_rope_half_perm(C_int, num_heads))
    qp = _split_heads(_linear_perm(p["q_proj"], q, perm), num_heads)
    if k_cached is None:
        kp = _split_heads(_linear_perm(p["k_proj"], k, perm), num_heads)
    else:
        ptr_k = _linear_perm(p["k_proj"], k[:, k_cached.shape[1]:], perm)
        kp = _split_heads(
            jnp.concatenate([k_cached.astype(q.dtype), ptr_k], axis=1), num_heads)

    head_dim = qp.shape[-1]
    # Low-rank value path: values get no RoPE, so P @ (v W_v) == (P @ v) W_v
    # exactly (masked-softmax rows sum to 1, so the bias also commutes). When
    # the raw kv dim (64 memory channels) is below the head dim, feeding raw
    # tokens as V halves the PV MXU work on the ~29k-token memory and skips
    # writing the projected [Nk, 256] V tensor to HBM.
    v_in = p["v_proj"]["w"].shape[0]
    factor_v = v_in < head_dim
    if factor_v:
        vp = jnp.broadcast_to(v[:, None], (v.shape[0], num_heads, v.shape[1], v_in))
    else:
        vp = _split_heads(layers.linear_apply(p["v_proj"], v), num_heads)

    w, h = q_hw
    cos, sin = axial_rope_cos_sin(head_dim, w, h, rope_theta)
    qp = _apply_rope_half(qp, cos, sin)

    nk = kp.shape[2]
    num_k_rope = nk - num_k_exclude_rope
    if k_cached is None and num_k_rope > 0:
        repeat = num_k_rope // qp.shape[2] if rope_k_repeat else 1
        k_rot = _apply_rope_half(kp[:, :, :num_k_rope], cos, sin, repeat=repeat)
        kp = jnp.concatenate([k_rot, kp[:, :, num_k_rope:]], axis=2) \
            if num_k_exclude_rope > 0 else k_rot

    out = attention(qp, kp, vp, kv_mask=kv_mask)
    if factor_v:
        wv = p["v_proj"]["w"].reshape(v_in, num_heads, head_dim)
        out = jnp.einsum("bhqe,ehd->bhqd", out, wv.astype(out.dtype),
                         precision=layers.PRECISION)
        if "b" in p["v_proj"]:
            out = out + p["v_proj"]["b"].reshape(num_heads, head_dim)[None, :, None, :].astype(out.dtype)
    return layers.linear_apply(p["out_proj"], _merge_heads(out))


# ---------------------------------------------------------------------------
# TwoWayTransformer (transformer.py:28-196)
# ---------------------------------------------------------------------------


def two_way_block_init(key, embedding_dim: int, num_heads: int, mlp_dim: int,
                       attention_downsample_rate: int = 2):
    ks = jax.random.split(key, 5)
    return {
        "self_attn": attn_init(ks[0], embedding_dim, num_heads),
        "norm1": layers.layer_norm_init(embedding_dim),
        "cross_attn_token_to_image": attn_init(ks[1], embedding_dim, num_heads,
                                               attention_downsample_rate),
        "norm2": layers.layer_norm_init(embedding_dim),
        "mlp": layers.mlp_init(ks[2], embedding_dim, mlp_dim, embedding_dim, 2),
        "norm3": layers.layer_norm_init(embedding_dim),
        "norm4": layers.layer_norm_init(embedding_dim),
        "cross_attn_image_to_token": attn_init(ks[3], embedding_dim, num_heads,
                                               attention_downsample_rate),
    }


def two_way_block_apply(p, queries, keys, query_pe, key_pe, num_heads: int,
                        skip_first_layer_pe: bool):
    if skip_first_layer_pe:
        queries = attn_apply(p["self_attn"], queries, queries, queries, num_heads)
    else:
        q = queries + query_pe
        queries = queries + attn_apply(p["self_attn"], q, q, queries, num_heads)
    queries = layers.layer_norm_apply(p["norm1"], queries)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + attn_apply(p["cross_attn_token_to_image"], q, k, keys, num_heads)
    queries = layers.layer_norm_apply(p["norm2"], queries)

    queries = queries + layers.mlp_apply(p["mlp"], queries)
    queries = layers.layer_norm_apply(p["norm3"], queries)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + attn_apply(p["cross_attn_image_to_token"], k, q, queries, num_heads)
    keys = layers.layer_norm_apply(p["norm4"], keys)
    return queries, keys


def two_way_transformer_init(key, depth: int, embedding_dim: int, num_heads: int,
                             mlp_dim: int, attention_downsample_rate: int = 2):
    ks = jax.random.split(key, depth + 1)
    return {
        "layers": [
            two_way_block_init(ks[i], embedding_dim, num_heads, mlp_dim,
                               attention_downsample_rate)
            for i in range(depth)
        ],
        "final_attn_token_to_image": attn_init(ks[depth], embedding_dim, num_heads,
                                               attention_downsample_rate),
        "norm_final_attn": layers.layer_norm_init(embedding_dim),
    }


def two_way_transformer_apply(p, image_embedding, image_pe, point_embedding,
                              num_heads: int):
    """image_embedding/image_pe [B, H, W, C]; point_embedding [B, N, C]
    -> (queries [B, N, C], keys [B, HW, C]) (``transformer.py:74-118``)."""
    B, H, W, C = image_embedding.shape
    keys = image_embedding.reshape(B, H * W, C)
    key_pe = image_pe.reshape(B, H * W, C).astype(keys.dtype)

    queries = point_embedding
    for i, lp in enumerate(p["layers"]):
        queries, keys = two_way_block_apply(
            lp, queries, keys, point_embedding, key_pe, num_heads,
            skip_first_layer_pe=(i == 0),
        )

    q = queries + point_embedding
    k = keys + key_pe
    queries = queries + attn_apply(p["final_attn_token_to_image"], q, k, keys, num_heads)
    queries = layers.layer_norm_apply(p["norm_final_attn"], queries)
    return queries, keys

"""Hiera hierarchical ViT trunk (TPU-native rebuild of
``sam2_train/modeling/backbones/hieradet.py``).

Architecture: 7x7/stride-4 patch embed -> 4 stages of MultiScaleBlocks with
window attention (window sizes per stage, a few global-attention blocks) and
MaxPool q-pooling at stage transitions; windowed absolute position embedding
(7x7 background embedding bicubic-interpolated + tiled window embedding,
``hieradet.py:269-277``). Returns per-stage NHWC feature maps.

All block shapes are static per (config, input size), so jit traces once; the
per-block schedule (dims, heads, window size, q-stride) is precomputed in
:meth:`HieraConfig.block_schedule`.
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from medsam2_tpu.configs import HieraConfig
from medsam2_tpu.core import layers
from medsam2_tpu.ops import fused_block
from medsam2_tpu.ops.attention import attention
from medsam2_tpu.ops.fused_mlp import ln_mlp_residual


# NOTE (measured, v5e): packing G tiny windows into one block-diagonal masked
# attention (G*n x G*n logits, exact via -1e30 masking) was tried for the
# seq-16/49/64 window stages and is NET NEGATIVE (stage1 0.77 -> 1.08 ms;
# stage2/4 flat): XLA already batches the tiny matmuls well enough that the
# G-fold extra logits FLOPs only add work. Per-block cost is dominated by
# projections/MLP + layout ops, not the window attention.


def hiera_init(key, cfg: HieraConfig):
    keys = jax.random.split(key, cfg.depth + 3)
    params = {
        "patch_embed": {
            "proj": layers.conv2d_init(keys[0], 3, cfg.embed_dim, cfg.patch_kernel)
        },
        # Stored channels-last [h, w, C] (torch keeps [1, C, h, w]).
        "pos_embed": jnp.zeros(
            (*cfg.window_pos_embed_bkg_spatial_size, cfg.embed_dim), jnp.float32
        ),
        "pos_embed_window": jnp.zeros(
            (cfg.window_spec[0], cfg.window_spec[0], cfg.embed_dim), jnp.float32
        ),
        "blocks": [],
    }
    params["pos_embed"] = layers.trunc_normal(keys[1], params["pos_embed"].shape)
    params["pos_embed_window"] = layers.trunc_normal(keys[2], params["pos_embed_window"].shape)
    for i, spec in enumerate(cfg.block_schedule()):
        k = keys[i + 3]
        k1, k2, k3, k4 = jax.random.split(k, 4)
        dim, dim_out = spec["dim"], spec["dim_out"]
        block = {
            "norm1": layers.layer_norm_init(dim),
            "attn": {
                "qkv": layers.linear_init(k1, dim, dim_out * 3),
                "proj": layers.linear_init(k2, dim_out, dim_out),
            },
            "norm2": layers.layer_norm_init(dim_out),
            "mlp": layers.mlp_init(k3, dim_out, int(dim_out * cfg.mlp_ratio), dim_out, 2),
        }
        if dim != dim_out:
            block["proj"] = layers.linear_init(k4, dim, dim_out)
        params["blocks"].append(block)
    return params


def _get_pos_embed(params, h: int, w: int):
    """Bicubic-interpolated background embed + tiled window embed (``hieradet.py:269-277``)."""
    bkg = layers.bicubic_resize(params["pos_embed"][None], h, w)[0]  # [h, w, C]
    win = params["pos_embed_window"]
    wh, ww = win.shape[0], win.shape[1]
    tiled = jnp.tile(win, (h // wh, w // ww, 1))
    return bkg + tiled


def _patch_embed_s2d(p, x, cfg: HieraConfig):
    """Space-to-depth patch embedding: the 7x7/stride-4 conv over 3 input
    channels lowers terribly on the MXU (tiny contraction depth). Rewritten as
    an exact k=2/s=1 VALID conv over 4x4 space-to-depth blocks with the kernel
    zero-padded to 8x8 — identical output, ~48-deep contractions.

    Derivation: out(i,j) = sum_{a,b<7} x[4i-3+a, 4j-3+b] w[a,b]; padding the
    input by 4 (top/left) and the kernel to 8x8 at offset (1,1) aligns every
    tap to a 2x2 window of 4x4 blocks.
    """
    B, H, W, C = x.shape
    s = 4
    # pad: 4 top/left, 3 bottom/right -> (H+7) rounded to H+8 block-aligned
    xp = jnp.pad(x, ((0, 0), (4, s - 1 + (-(H + 3) % s)), (4, s - 1 + (-(W + 3) % s)), (0, 0)))
    Hp, Wp = xp.shape[1], xp.shape[2]
    xb = xp.reshape(B, Hp // s, s, Wp // s, s, C).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(B, Hp // s, Wp // s, s * s * C)

    w = p["w"]  # [7, 7, Cin, Cout]
    w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # taps at offsets 1..7
    w2 = w8.reshape(2, s, 2, s, C, w.shape[-1]).transpose(0, 2, 1, 3, 4, 5)
    w2 = w2.reshape(2, 2, s * s * C, w.shape[-1])

    y = jax.lax.conv_general_dilated(
        xb, w2.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=layers.PRECISION)
    y = y[:, : H // s, : W // s, :]
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _patch_embed_wfold(p, x):
    """Width-folded patch embedding — the fastest lowering measured on v5e.

    The 7x7/stride-4 conv is recast so NO data transpose is needed: padding
    the input by 4 (top/left) and the kernel to 8x8 at offset (1,1) makes
    every output tap start block-aligned; folding the width axis by 4 into
    channels is then a *contiguous reshape* ([..., W, C] -> [..., W/4, 4C]),
    and the kernel becomes [kh=8, kw=2, 4C, O] with stride (4, 1). Height
    stays spatial, so the MXU sees a depth-8*2*12 contraction and the only
    data movement is the pad memcpy (vs the 2x2 space-to-depth form whose
    6D transpose dominated: 0.79 ms -> ~0.1 ms at 1024 px).

    out(i,j) = sum_{a,b<7} x[4i-3+a, 4j-3+b] w[a,b]; with xp = pad(x,(4,0))
    and w8[a',b'] = w[a'-1,b'-1]: out(i,j) = sum_{a',b'<8} xp[4i+a',4j+b']
    w8[a',b']; b' = 4*beta + r folds into (kw=beta, channel=r*C+c).
    """
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (4, 0), (4, 0), (0, 0)))
    xw = xp.reshape(B, H + 4, (W + 4) // 4, 4 * C)

    w = p["w"]  # [7, 7, C, O]
    w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    wf = w8.reshape(8, 2, 4 * C, w.shape[-1])

    y = jax.lax.conv_general_dilated(
        xw, wf.astype(x.dtype), (4, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=layers.PRECISION)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _split_qkv_enabled() -> bool:
    """Project q, k, v with three weight slices instead of one fused matmul +
    [N, 3, h, d] reshape/slice: the fused form materializes the 3-axis
    rearrangement as HLO copies (~170 MB/frame @1024 across blocks — the
    largest single class in scripts/audit_copies.py). Column-exact: each
    output column sees the same weight column either way."""
    return os.environ.get("MEDSAM2_SPLIT_QKV", "1") == "1"


def _attention_block(bp, x, spec, q_stride):
    """MultiScaleAttention (``hieradet.py:37-83``): fused qkv, optional q max-pooling."""
    B, H, W, _ = x.shape
    num_heads = spec["num_heads"]
    dim_out = spec["dim_out"]
    if _split_qkv_enabled():
        w, b = bp["qkv"]["w"], bp["qkv"].get("b")
        xf = x.reshape(B, H * W, -1)
        parts = []
        for j in range(3):
            pj = {"w": w[:, j * dim_out:(j + 1) * dim_out]}
            if b is not None:
                pj["b"] = b[j * dim_out:(j + 1) * dim_out]
            parts.append(layers.linear_apply(pj, xf).reshape(
                B, H * W, num_heads, dim_out // num_heads))
        q, k, v = parts
    else:
        qkv = layers.linear_apply(bp["qkv"], x.reshape(B, H * W, -1))
        qkv = qkv.reshape(B, H * W, 3, num_heads, dim_out // num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, h, d]

    if q_stride is not None:
        q = q.reshape(B, H, W, dim_out)
        q = layers.max_pool2d(q, q_stride, q_stride)
        Hq, Wq = q.shape[1], q.shape[2]
        q = q.reshape(B, Hq * Wq, num_heads, dim_out // num_heads)
        H, W = Hq, Wq

    out = attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    ).transpose(0, 2, 1, 3)
    out = out.reshape(B, H, W, dim_out)
    return layers.linear_apply(bp["proj"], out)


# Fused Pallas window attention: measured NEGATIVE in context, so off by
# default. Isolated per-block slope timing (scripts/sweep_fused_window.py,
# incl. qkv/proj linears, hiera_t @1024) says the kernel wins at ws=4
# (0.099 vs 0.290 ms) and ws=14 (0.173 vs 0.202), but inside the full
# encoder graph the same ws=4 block balloons stage2 from 1.35 to 7.04 ms
# (scripts/profile_encoder.py): XLA's layout assignment around the
# pallas_call inserts relayouts of the [1, H, W, 3C] operands that dwarf
# the attention itself. Until the kernel can consume XLA's preferred
# layouts, the XLA partition/SDPA path stays.
_FUSED_WINDOW_SIZES: tuple = ()


def _use_fused_window(window_size: int, q_stride) -> bool:
    # q-pooled and global blocks always keep the XLA path; CPU keeps XLA so
    # torch-parity tests pin the reference math directly (the kernel itself
    # is interpret-tested). MEDSAM2_FUSED_WINDOW=1 forces all eligible
    # sizes (for sweeps); =0 disables even the default list.
    import os

    import jax as _jax

    mode = os.environ.get("MEDSAM2_FUSED_WINDOW", "auto")
    if mode == "0":
        return False
    ws_ok = window_size in _FUSED_WINDOW_SIZES if mode != "1" else window_size > 0
    return (ws_ok and q_stride is None and _jax.default_backend() == "tpu")


def _window_attention_dot6d(bp, x, num_heads: int, dim_out: int, ws: int):
    """Windowed attention without partition transposes.

    The classic lowering (window_partition -> SDPA -> unpartition) materializes
    ~640 MB/frame of relayout copies @1024 (HLO-audited): the 6-D partition
    transpose, the qkv [nW, N, 3, h, d] reshape, and the head transposes.
    Here every axis split is a contiguous (free) reshape and the window/head
    structure is expressed through dot_general batch dims instead of data
    movement — the lone transpose is the final [B, nH, nW, wq, ww, O] ->
    [B, nH, wq, nW, ww, O] interleave on the output.

    Math-identical to the partition path (same qkv linear, fp32 softmax,
    1/sqrt(d) scale); plain windowed blocks only (no q-pooling).

    MEASURED NEGATIVE on v5e @1024 (kept flag-gated for other chips/shapes):
    encoder-in-scan 5.30 -> 8.14 ms/frame — XLA canonicalizes the
    multi-batch-dim dot_generals with internal relayouts costlier than the
    explicit partition transposes it avoids. The copies it targets are real
    (~640 MB/frame of relayout copies in the audited HLO) but this lowering
    trades them for worse ones.
    """
    B, H, W, _ = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    nH, nW = Hp // ws, Wp // ws
    dh = dim_out // num_heads

    qkv = layers.linear_apply(bp["qkv"], x)          # [B, Hp, Wp, 3*dim_out]
    qkv = qkv.reshape(B, nH, ws, nW, ws, 3, num_heads, dh)
    q = qkv[..., 0, :, :]                            # [B, nH, w, nW, w, h, dh]
    k = qkv[..., 1, :, :]
    v = qkv[..., 2, :, :]

    dn_qk = (((6,), (6,)), ((0, 1, 3, 5), (0, 1, 3, 5)))
    s = jax.lax.dot_general(q, k, dn_qk, precision=layers.PRECISION,
                            preferred_element_type=jnp.float32)
    # s: [B, nH, nW, h, wq1, wq2, wk1, wk2]; fp32 softmax as sdpa_xla
    s = s * np.float32(1.0 / np.sqrt(dh))
    p = jax.nn.softmax(s.reshape(*s.shape[:6], ws * ws), axis=-1)
    p = p.reshape(s.shape).astype(x.dtype)

    dn_pv = (((6, 7), (2, 4)), ((0, 1, 2, 3), (0, 1, 3, 5)))
    o = jax.lax.dot_general(p, v, dn_pv, precision=layers.PRECISION,
                            preferred_element_type=jnp.float32)
    o = o.astype(x.dtype)
    # o: [B, nH, nW, h, wq1, wq2, dh]
    wproj = bp["proj"]["w"].reshape(num_heads, dh, dim_out).astype(x.dtype)
    dn_proj = (((3, 6), (0, 1)), ((), ()))
    y = jax.lax.dot_general(o, wproj, dn_proj, precision=layers.PRECISION)
    # y: [B, nH, nW, wq1, wq2, O] -> interleave back to spatial
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, dim_out)
    if "b" in bp["proj"]:
        y = y + bp["proj"]["b"].astype(x.dtype)
    if ph or pw:
        y = y[:, :H, :W]
    return y


def _window_lowering() -> str:
    # "partition" (classic) | "dot6d"; dot6d covers plain windowed blocks.
    return os.environ.get("MEDSAM2_WINDOW_LOWERING", "partition")


def _block_apply(bp, x, spec):
    """MultiScaleBlock (``hieradet.py:136-168``)."""
    window_size = spec["window_size"]
    q_stride = spec["q_stride"]
    dim, dim_out = spec["dim"], spec["dim_out"]

    shortcut = x  # [B, H, W, C]
    x = layers.layer_norm_apply(bp["norm1"], x, eps=1e-6)

    if dim != dim_out:
        shortcut = layers.linear_apply(bp["proj"], x)
        if q_stride is not None:
            shortcut = layers.max_pool2d(shortcut, q_stride, q_stride)

    if (window_size > 0 and q_stride is None
            and _window_lowering() == "dot6d"):
        att = _window_attention_dot6d(bp["attn"], x, spec["num_heads"],
                                      dim_out, window_size)
        x = shortcut + att
        x = ln_mlp_residual(x, bp["norm2"], bp["mlp"], eps=1e-6)
        return x

    if _use_fused_window(window_size, q_stride):
        from medsam2_tpu.ops.window_attention import window_attention

        H, W = x.shape[1], x.shape[2]
        ph = (window_size - H % window_size) % window_size
        pw = (window_size - W % window_size) % window_size
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0))) if ph or pw else x
        qkv = layers.linear_apply(bp["attn"]["qkv"], xp)
        out = window_attention(qkv, spec["num_heads"], window_size)
        if ph or pw:
            out = out[:, :H, :W]
        x = shortcut + layers.linear_apply(bp["attn"]["proj"], out)
        x = ln_mlp_residual(x, bp["norm2"], bp["mlp"], eps=1e-6)
        return x

    H, W = x.shape[1], x.shape[2]
    pad_hw = (H, W)
    if window_size > 0:
        x, pad_hw = layers.window_partition(x, window_size)

    x = _attention_block(bp["attn"], x, spec, q_stride)

    out_ws = window_size
    if q_stride is not None:
        # Shapes changed under q-pooling: unpartition at the pooled geometry
        # (window size and padded extent shrink by the stride, hieradet.py:152-159).
        out_ws = window_size // q_stride[0]
        H, W = shortcut.shape[1], shortcut.shape[2]
        pad_h = (out_ws - H % out_ws) % out_ws if out_ws > 0 else 0
        pad_w = (out_ws - W % out_ws) % out_ws if out_ws > 0 else 0
        pad_hw = (H + pad_h, W + pad_w)
    else:
        H, W = shortcut.shape[1], shortcut.shape[2]

    if window_size > 0:
        x = layers.window_unpartition(x, out_ws, pad_hw, (H, W))

    x = shortcut + x
    x = ln_mlp_residual(x, bp["norm2"], bp["mlp"], eps=1e-6)
    return x


def _block_apply_windows(bp, wins, spec):
    """MultiScaleBlock on pre-partitioned windows [Bn, ws, ws, C], valid only
    when the spatial extent divides the window size (no padding). Exact same
    math as :func:`_block_apply`: layer norm, MLP and residuals are per-token;
    attention and q-pooling are window-local (``hieradet.py:136-168``)."""
    if (fused_block.fused_block_enabled()
            and jax.default_backend() == "tpu"
            and fused_block.fused_window_block_supported(bp, spec, wins.shape)):
        return fused_block.fused_window_block(wins, bp, spec)
    q_stride = spec["q_stride"]
    dim, dim_out = spec["dim"], spec["dim_out"]
    shortcut = wins
    x = layers.layer_norm_apply(bp["norm1"], wins, eps=1e-6)
    if dim != dim_out:
        shortcut = layers.linear_apply(bp["proj"], x)
        if q_stride is not None:
            shortcut = layers.max_pool2d(shortcut, q_stride, q_stride)
    x = _attention_block(bp["attn"], x, spec, q_stride)
    x = shortcut + x
    x = ln_mlp_residual(x, bp["norm2"], bp["mlp"], eps=1e-6)
    return x


def _chain_windows_enabled() -> bool:
    """Keep consecutive compatible-window blocks in partitioned layout.

    The hiera schedule pools by exactly the window-size ratio at stage
    transitions (ws8 -> pool -> ws4 -> ws4 -> pool), so when the extent
    divides the window size the ws-partition of stage N's output *is* the
    ws'-partition of stage N+1's input (same 32x32 window grid @1024): one
    partition after the patch embed and one unpartition into stage 3 replace
    6+ per-block 6-D transposes (HLO copy audit: ~200 MB/frame of partition
    relayouts, scripts/audit_copies.py). Exact — pure layout."""
    return os.environ.get("MEDSAM2_CHAIN_WINDOWS", "1") == "1"


def hiera_apply(params, cfg: HieraConfig, x: jnp.ndarray,
                pos_embed: jnp.ndarray = None) -> List[jnp.ndarray]:
    """x: [B, H, W, 3] NHWC image -> list of per-stage feature maps [B, h, w, C].

    ``pos_embed``: optional precomputed :func:`_get_pos_embed` output — pass it
    when calling inside a ``lax.scan`` so the bicubic interpolation is hoisted
    out of the loop (it depends only on params and static shape)."""
    if (cfg.patch_kernel == (7, 7) and cfg.patch_stride == (4, 4)
            and cfg.patch_padding == (3, 3) and x.shape[1] % 4 == 0
            and x.shape[2] % 4 == 0):
        x = _patch_embed_wfold(params["patch_embed"]["proj"], x)
    elif cfg.patch_kernel == (7, 7) and cfg.patch_stride == (4, 4) and cfg.patch_padding == (3, 3):
        x = _patch_embed_s2d(params["patch_embed"]["proj"], x, cfg)
    else:
        x = layers.conv2d_apply(
            params["patch_embed"]["proj"], x, stride=cfg.patch_stride,
            explicit_padding=cfg.patch_padding,
        )
    if pos_embed is None:
        pos_embed = _get_pos_embed(params, x.shape[1], x.shape[2])
    x = x + pos_embed.astype(x.dtype)

    outputs = []
    schedule = cfg.block_schedule()
    stage_ends = set(cfg.stage_ends)
    chain = _chain_windows_enabled()
    wins = None        # current partitioned tensor [Bn, cur_ws, cur_ws, C]
    cur_ws = None      # its window size
    cur_hw = None      # the spatial extent it unpartitions to
    for i, (bp, spec) in enumerate(zip(params["blocks"], schedule)):
        ws = spec["window_size"]
        if chain and ws > 0:
            if wins is not None and cur_ws != ws:
                x = layers.window_unpartition(wins, cur_ws, cur_hw, cur_hw)
                wins = None
            if wins is None:
                H, W = x.shape[1], x.shape[2]
                if H % ws == 0 and W % ws == 0:
                    wins, _ = layers.window_partition(x, ws)
                    cur_hw = (H, W)
            if wins is not None:
                wins = _block_apply_windows(bp, wins, spec)
                cur_ws = wins.shape[1]
                if spec["q_stride"] is not None:
                    cur_hw = (cur_hw[0] // spec["q_stride"][0],
                              cur_hw[1] // spec["q_stride"][1])
                if i in stage_ends:
                    x = layers.window_unpartition(wins, cur_ws, cur_hw, cur_hw)
                    outputs.append(x)
                continue
        if wins is not None:
            x = layers.window_unpartition(wins, cur_ws, cur_hw, cur_hw)
            wins = None
        x = _block_apply(bp, x, spec)
        if i in stage_ends:
            outputs.append(x)
    return outputs

"""Fused multi-window attention Pallas kernel for the Hiera trunk.

The reference computes windowed attention by partitioning [B, H, W, C] into
[B*G, ws*ws, C] windows and running SDPA per window
(``sam2_train/modeling/backbones/hieradet.py:112-134``). On TPU the tiny
per-window attentions sit at a ~0.1 ms/call dispatch+layout floor (the
partition/unpartition transposes plus head-split layout passes dominate; the
FLOPs are negligible — measured in ``scripts/sweep_window_attn.py``).

This kernel takes the fused qkv tensor in its natural [B, H, W, 3C] layout and
computes all windows in one pallas_call:

- grid over (batch, window-rows); each program streams one [ws, W, 3C] slab
  through VMEM — no window partition/unpartition ever materializes in HBM;
- tiny windows are *packed* along the MXU lane axis: ``p = 128 // (ws*ws)``
  windows form one [p*ws*ws, d] tile and a single masked [N, N] logit tile
  (N <= 256), turning p micro-matmuls into one full-tile MXU pass. The packed
  order interleaves windows (a plain reshape of [ws, p*ws, C]); attention with
  the matching block mask is permutation-exact, so no transpose is needed;
- softmax in fp32, dots in the input dtype with fp32 accumulation (the same
  discipline as :mod:`medsam2_tpu.ops.attention`).

Used for non-pooled windowed Hiera blocks; global-attention and q-pooled
blocks keep the XLA path (see ``core/hiera.py``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pack_factor(window_size: int) -> int:
    n = window_size * window_size
    return max(1, 128 // n)


def _window_attn_kernel(qkv_ref, o_ref, *, num_heads: int, window: int,
                        pack: int, scale: float):
    blk = qkv_ref[0]                      # [ws, Wp, 3C]
    ws = window
    Wp = blk.shape[1]
    C3 = blk.shape[2]
    C = C3 // 3
    d = C // num_heads
    pw = pack * ws                        # packed width (columns per tile)
    N = ws * pw                           # tokens per packed tile

    if pack > 1:
        # token t of the packed [ws, pw, C] reshape sits at (row r, col c),
        # t = r*pw + c; its window is c // ws. Same-window mask in this
        # interleaved order — attention is permutation-exact under it.
        t = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        u = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        same = ((t % pw) // ws) == ((u % pw) // ws)

    for g in range(Wp // pw):
        sub = blk[:, g * pw:(g + 1) * pw, :].reshape(N, C3)
        for h in range(num_heads):
            q = sub[:, h * d:(h + 1) * d]
            k = sub[:, C + h * d:C + (h + 1) * d]
            v = sub[:, 2 * C + h * d:2 * C + (h + 1) * d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # [N, N]
            if pack > 1:
                s = jnp.where(same, s, _NEG_INF)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [N, d]
            o_ref[0, :, g * pw:(g + 1) * pw, h * d:(h + 1) * d] = (
                o.reshape(ws, pw, d).astype(o_ref.dtype))


def _window_attn_kernel_3d(qkv_ref, o_ref, *, num_heads: int, window: int,
                           pack: int, scale: float):
    """3-D variant of :func:`_window_attn_kernel`: refs are [ws, Wp, {3C|C}]."""
    blk = qkv_ref[...]                    # [ws, Wp, 3C]
    ws = window
    Wp = blk.shape[1]
    C3 = blk.shape[2]
    C = C3 // 3
    d = C // num_heads
    pw = pack * ws
    N = ws * pw

    if pack > 1:
        t = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        u = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        same = ((t % pw) // ws) == ((u % pw) // ws)

    for g in range(Wp // pw):
        sub = blk[:, g * pw:(g + 1) * pw, :].reshape(N, C3)
        for h in range(num_heads):
            q = sub[:, h * d:(h + 1) * d]
            k = sub[:, C + h * d:C + (h + 1) * d]
            v = sub[:, 2 * C + h * d:2 * C + (h + 1) * d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # [N, N]
            if pack > 1:
                s = jnp.where(same, s, _NEG_INF)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [N, d]
            o_ref[:, g * pw:(g + 1) * pw, h * d:(h + 1) * d] = (
                o.reshape(ws, pw, d).astype(o_ref.dtype))


def window_attention_v2(qkv: jnp.ndarray, num_heads: int, window_size: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Same math as :func:`window_attention`, lowered with the flash kernel's
    pallas shape discipline: rank-3 operands ([B*Hp, Wp, 3C] via a free
    reshape), a 1-D grid over window rows, and "arbitrary" dimension
    semantics. The original 4-D/all-parallel form triggers a pathological
    interaction on v5e when a convolution sits upstream in the same program
    (the patch-embed conv runs ~8x slow: blocks0-2 2.3 -> 8.0 ms in
    scripts/sweep_stage2_variants.py); this shape mirrors
    ops/attention.py's flash kernel, which coexists with the same conv at
    full speed in the production scan."""
    B, Hp, Wp, C3 = qkv.shape
    C = C3 // 3
    ws = window_size
    if Hp % ws or Wp % ws:
        raise ValueError(f"padded dims ({Hp}, {Wp}) not multiples of {ws}")
    pack = _pack_factor(ws)
    while Wp % (pack * ws) and pack > 1:
        pack //= 2
    scale = 1.0 / math.sqrt(C // num_heads)

    q3 = qkv.reshape(B * Hp, Wp, C3)
    out = pl.pallas_call(
        functools.partial(_window_attn_kernel_3d, num_heads=num_heads,
                          window=ws, pack=pack, scale=scale),
        grid=(B * Hp // ws,),
        in_specs=[pl.BlockSpec((ws, Wp, C3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((ws, Wp, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hp, Wp, C), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(q3)
    return out.reshape(B, Hp, Wp, C)


@functools.partial(jax.jit, static_argnames=("num_heads", "window_size",
                                             "interpret"))
def window_attention(qkv: jnp.ndarray, num_heads: int, window_size: int,
                     interpret: bool = False) -> jnp.ndarray:
    """qkv [B, Hp, Wp, 3C] (Hp, Wp multiples of window_size) -> [B, Hp, Wp, C]
    of per-window attention outputs (heads split as [3, heads, d] over the
    channel axis, matching the Hiera qkv reshape)."""
    B, Hp, Wp, C3 = qkv.shape
    C = C3 // 3
    ws = window_size
    if Hp % ws or Wp % ws:
        raise ValueError(f"padded dims ({Hp}, {Wp}) not multiples of {ws}")
    pack = _pack_factor(ws)
    while Wp % (pack * ws) and pack > 1:
        pack //= 2
    scale = 1.0 / math.sqrt(C // num_heads)

    grid = (B, Hp // ws)
    return pl.pallas_call(
        functools.partial(_window_attn_kernel, num_heads=num_heads,
                          window=ws, pack=pack, scale=scale),
        grid=grid,
        in_specs=[pl.BlockSpec((1, ws, Wp, C3), lambda b, i: (b, i, 0, 0))],
        out_specs=pl.BlockSpec((1, ws, Wp, C), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qkv)

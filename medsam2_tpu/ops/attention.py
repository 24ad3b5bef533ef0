"""Scaled dot-product attention: XLA path + Pallas TPU flash kernel.

Every attention in the framework goes through :func:`attention`. The reference
explicitly disables flash attention and forces the math SDPA kernel
(``sam2_train/modeling/sam/transformer.py:22-25``); here the hot path (memory
cross-attention: 4096 queries vs ~28k memory tokens at 1024 px) runs a proper
online-softmax flash kernel tiled for the MXU, and small/odd-shaped attentions
(window attention, two-way decoder) take the XLA path, which fuses fine.

Shapes: q [B, H, Nq, D], k/v [B, H, Nk, D]; optional ``kv_mask`` [B, Nk] bool
(True = valid). Output [B, H, Nq, D] in q's dtype; accumulation is fp32.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def sdpa_xla(q, k, v, kv_mask=None, scale=None):
    """Plain XLA attention (fp32 softmax), matching torch's math SDPA.

    ``v`` may have a different head dim than q/k (the low-rank value path
    feeds raw 64-dim memory tokens; the value projection is applied to the
    short output instead of the long kv)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    logits = logits * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhke->bhqe", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_scratch, l_scratch, acc_scratch,
                  *, scale, num_kv_blocks):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # Dots run in the input dtype (bf16 hot path -> native MXU passes) with
    # fp32 accumulation; fp32 inputs keep full-precision dots for parity tests.
    q = q_ref[0]                              # [bq, D]
    k = k_ref[0]                              # [bk, D]
    v = v_ref[0]                              # [bk, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale  # [bq, bk]
    mask = mask_ref[0]                        # [1, bk] int32 (1 = valid)
    s = jnp.where(mask > 0, s, _NEG_INF)

    m_prev = m_scratch[:]                     # [bq, 1]
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    # Guard fully-masked rows: exp(-inf - -inf) -> use large negative sentinel.
    p = jnp.exp(s - m_next)                   # [bq, bk]
    alpha = jnp.exp(m_prev - m_next)          # [bq, 1]
    l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scratch[:] = m_next
    l_scratch[:] = l_next

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        l = l_scratch[:]
        l = jnp.where(l == 0.0, 1.0, l)       # fully-masked rows -> zeros
        o_ref[0] = (acc_scratch[:] / l).astype(o_ref.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(q, k, v, kv_mask=None, scale=None, block_q=512, block_k=512):
    """Pallas TPU flash attention. q [B,H,Nq,D], k [B,H,Nk,D], v [B,H,Nk,Dv]
    (Dv may differ from D — the low-rank value path), kv_mask [B,Nk]."""
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    Dv = v.shape[3]
    if scale is None:
        scale = 1.0 / math.sqrt(D)  # scale by the true head dim before padding
    if kv_mask is None:
        kv_mask = jnp.ones((B, Nk), jnp.int32)
    else:
        kv_mask = kv_mask.astype(jnp.int32)

    # Pad head dims to a lane multiple (zeros leave QK^T logits and the
    # valid output channels unchanged; padded channels are sliced off).
    Dp = max(((D + 127) // 128) * 128, 128)
    Dvp = max(((Dv + 127) // 128) * 128, 128)
    if Dp != D:
        q = _pad_to(q, 3, Dp)
        k = _pad_to(k, 3, Dp)
    if Dvp != Dv:
        v = _pad_to(v, 3, Dvp)

    bq = min(block_q, max(Nq, 8))
    bk = min(block_k, max(Nk, 128))
    qf = _pad_to(q.reshape(B * H, Nq, Dp), 1, bq)
    kf = _pad_to(k.reshape(B * H, Nk, Dp), 1, bk)
    vf = _pad_to(v.reshape(B * H, Nk, Dvp), 1, bk)
    maskf = _pad_to(jnp.repeat(kv_mask[:, None, :], H, axis=1).reshape(B * H, 1, Nk), 2, bk)
    Nq_p, Nk_p = qf.shape[1], kf.shape[1]
    num_q_blocks = Nq_p // bq
    num_kv_blocks = Nk_p // bk

    grid = (B * H, num_q_blocks, num_kv_blocks)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, num_kv_blocks=num_kv_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, Dvp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bq, Dvp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Nq_p, Dvp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, Dvp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf, maskf)
    return out[:, :Nq, :Dv].reshape(B, H, Nq, Dv)


def _use_flash(q_len: int, kv_len: int, head_dim: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # Flash pays off for long sequences; tiny decoder/window attentions stay on XLA.
    return q_len >= 2048 and kv_len >= 2048 and head_dim >= 64


def _flash_blocks(q_len: int, kv_len: int, dv: int = 0, itemsize: int = 4):
    """Measured on v5e (scripts/calibrate_overhead.py, profile_crossattn.py):
    long-kv cross attention prefers tall q blocks; with low-rank values
    (dv <= 128) the smaller V/acc footprint lets the kv block double to 1024,
    which is the fastest config (0.585 ms vs 0.748 at the @1024 memory shape —
    dv256 OOMs VMEM there); square self/global attention prefers wide kv
    blocks (512/1024)."""
    if kv_len >= 2 * q_len:
        if dv and dv <= 128 and itemsize <= 2:
            return 2048, 1024   # only fits VMEM for 2-byte inputs
        return 2048, 512
    return 512, 1024


def attention(q, k, v, kv_mask=None, scale=None, force: Optional[str] = None):
    """Dispatch to the flash kernel or the XLA path.

    ``force``: "flash" | "xla" | None (auto).
    """
    if force == "flash" or (force is None and _use_flash(q.shape[2], k.shape[2], q.shape[3])):
        bq, bk = _flash_blocks(q.shape[2], k.shape[2], v.shape[3],
                               jnp.dtype(q.dtype).itemsize)
        return flash_attention(q, k, v, kv_mask=kv_mask, scale=scale,
                               block_q=bq, block_k=bk)
    return sdpa_xla(q, k, v, kv_mask=kv_mask, scale=scale)

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
import os
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


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *rest,
                  scale, num_kv_blocks, with_lse):
    if with_lse:
        lse_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        lse_ref, (m_scratch, l_scratch, acc_scratch) = None, rest
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
    mask = mask_ref[0]                        # [1, bk] (>0 = valid)
    s = jnp.where(mask > 0, s, _NEG_INF)

    m_prev = m_scratch[:]                     # [bq, 1]
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    # Zero masked probabilities (maskf is exactly 0/1): without this, a fully
    # masked block has s == m_next == -1e30 so exp(0) = 1 would leak padded
    # rows into l/acc; with it, fully-masked rows keep l == 0 and hit the
    # zero-output finalize guard, matching the backward (which also zeroes
    # masked probabilities).
    p = jnp.exp(s - m_next) * mask            # [bq, bk]
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
        lz = jnp.where(l == 0.0, 1.0, l)      # fully-masked rows -> zeros
        o_ref[0] = (acc_scratch[:] / lz).astype(o_ref.dtype)
        if with_lse:
            # log-sum-exp per row (the backward recomputes P = exp(S - lse));
            # broadcast across a 128-lane axis for Mosaic block constraints;
            # fully-masked rows get a harmless finite value (bwd masks them).
            lse_ref[0] = jnp.broadcast_to(m_scratch[:] + jnp.log(lz),
                                          lse_ref.shape[1:])


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_call(qf, kf, vf, maskf, scale, bq, bk, with_lse=False):
    """Run the Pallas kernel on block-padded rank-3 inputs.

    qf [BH, Nq_p, Dp], kf [BH, Nk_p, Dp], vf [BH, Nk_p, Dvp],
    maskf [BH, 1, Nk_p] float (>0 valid). Returns (out [BH, Nq_p, Dvp],
    lse [BH, Nq_p] fp32 or None). The LSE output (needed only by the
    backward pass) costs an extra (bq, 128) fp32 VMEM block, so the
    inference path skips it."""
    BH, Nq_p, Dp = qf.shape
    Nk_p = kf.shape[1]
    Dvp = vf.shape[2]
    num_q_blocks = Nq_p // bq
    num_kv_blocks = Nk_p // bk

    out_specs = [pl.BlockSpec((1, bq, Dvp), lambda b, i, j: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((BH, Nq_p, Dvp), qf.dtype)]
    if with_lse:
        out_specs.append(pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((BH, Nq_p, 128), jnp.float32))

    grid = (BH, num_q_blocks, num_kv_blocks)
    res = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale,
                          num_kv_blocks=num_kv_blocks, with_lse=with_lse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, Dvp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, Dvp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf, maskf)
    if with_lse:
        return res[0], res[1][:, :, 0]
    return res[0], None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(qf, kf, vf, maskf, scale, bq, bk):
    return _flash_call(qf, kf, vf, maskf, scale, bq, bk)[0]


def _flash_fwd(qf, kf, vf, maskf, scale, bq, bk):
    # The LSE output block pushes the (2048, 1024) low-rank config past the
    # 16 MB VMEM budget; the training forward caps the q block at 1024
    # (measured 0.614 vs 0.585 ms at the @1024 memory shape - negligible).
    # Only when the padded Nq stays block-divisible - otherwise keep bq.
    bq_t = 1024 if (bq > 1024 and qf.shape[1] % 1024 == 0) else bq
    out, lse = _flash_call(qf, kf, vf, maskf, scale, bq_t, bk, with_lse=True)
    return out, (qf, kf, vf, maskf, out, lse)


def _flash_bwd_xla(scale, bq, bk, res, do):
    """KV-chunked attention backward on the padded rank-3 layout.

    Recomputes P = exp(S*scale - lse) one kv chunk at a time (flash-style, so
    the [Nq, Nk] probability matrix is never materialized whole), then the
    standard dS = P*(dO V^T - D), dQ = dS K, dK = dS^T Q, dV = P^T dO.

    Dtype discipline matches the forward kernel: dots run in the input dtype
    (bf16 training path -> native MXU passes) with fp32 accumulation via
    ``preferred_element_type``; softmax/rescale math stays fp32. fp32 inputs
    keep HIGHEST-precision dots for the grad-parity tests.
    """
    qf, kf, vf, maskf, o, lse = res
    f32 = jnp.float32
    in_dt = qf.dtype
    prec = (jax.lax.Precision.HIGHEST if in_dt == f32
            else jax.lax.Precision.DEFAULT)
    do_c = do.astype(in_dt)
    Dvec = jnp.sum(do.astype(f32) * o.astype(f32), axis=-1)  # [BH, Nq]
    Nk = kf.shape[1]
    # chunk must divide the (bk-multiple) padded Nk; prefer 512-wide chunks
    CH = 512 if Nk % 512 == 0 else bk
    nch = Nk // CH

    def body(dq, i):
        ks = jax.lax.dynamic_slice_in_dim(kf, i * CH, CH, 1)
        vs = jax.lax.dynamic_slice_in_dim(vf, i * CH, CH, 1)
        ms = jax.lax.dynamic_slice_in_dim(maskf, i * CH, CH, 2)  # [BH,1,CH]
        s = jnp.einsum("bqd,bkd->bqk", qf, ks, precision=prec,
                       preferred_element_type=f32) * scale
        p32 = jnp.where(ms > 0, jnp.exp(s - lse[..., None]), 0.0)  # [BH,Nq,CH]
        p = p32.astype(in_dt)
        dv = jnp.einsum("bqk,bqe->bke", p, do_c, precision=prec,
                        preferred_element_type=f32)
        dp = jnp.einsum("bqe,bke->bqk", do_c, vs, precision=prec,
                        preferred_element_type=f32)
        ds = (p32 * (dp - Dvec[..., None])).astype(in_dt)
        dq = dq + jnp.einsum("bqk,bkd->bqd", ds, ks, precision=prec,
                             preferred_element_type=f32) * scale
        dk = jnp.einsum("bqk,bqd->bkd", ds, qf, precision=prec,
                        preferred_element_type=f32) * scale
        return dq, (dk, dv)

    dq0 = jnp.zeros(qf.shape, f32)
    dq, (dks, dvs) = jax.lax.scan(body, dq0, jnp.arange(nch))
    dk = jnp.moveaxis(dks, 0, 1).reshape(kf.shape)
    dv = jnp.moveaxis(dvs, 0, 1).reshape(vf.shape)
    return (dq.astype(qf.dtype), dk.astype(kf.dtype), dv.astype(vf.dtype),
            jnp.zeros_like(maskf))


def _bwd_dkv_kernel(q_ref, do_ref, lse_ref, dvec_ref, k_ref, v_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale, num_q_blocks):
    """dK/dV pass: one kv block resident per (b, j); streams q blocks.

    Everything is computed in the transposed-S form (S^T = K Q^T, [bk, bq])
    so the per-q-row LSE and D vectors enter as lane-aligned [1, bq] rows —
    no sublane/lane relayouts anywhere in the kernel."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]                              # [bq, D]
    do = do_ref[0]                            # [bq, Dv]
    k = k_ref[0]                              # [bk, D]  (masked rows pre-zeroed)
    v = v_ref[0]                              # [bk, Dv]
    lse = lse_ref[0]                          # [1, bq] fp32
    dvec = dvec_ref[0]                        # [1, bq] fp32

    sT = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    # exp(S - lse) <= 1 for valid entries (l >= 1); the clamp only tames
    # masked/padded rows, whose contributions are killed by the zeroed K
    # rows (dQ) and the post-kernel dK/dV mask.
    pT32 = jnp.exp(jnp.minimum(sT - lse, 0.0))            # [bk, bq]
    pT = pT32.astype(v.dtype)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        pT, do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [bk, Dv]
    dpT = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [bk, bq]
    dsT = (pT32 * (dpT - dvec)).astype(q.dtype)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        dsT, q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [bk, D]

    @pl.when(i == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:] * scale
        dv_ref[0] = dv_acc[:]


def _bwd_dq_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dvec_ref,
                   dq_ref, dq_acc, *, scale, num_kv_blocks):
    """dQ pass: one q block resident per (b, i); streams kv blocks.
    Same transposed-S computation as the dKV pass; dQ = scale * dS^T-contract
    with the (masked-zeroed) K rows."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    do = do_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    lse = lse_ref[0]
    dvec = dvec_ref[0]

    sT = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    pT32 = jnp.exp(jnp.minimum(sT - lse, 0.0))
    dpT = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dsT = (pT32 * (dpT - dvec)).astype(k.dtype)
    dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
        dsT, k, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [bq, D]

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_acc[:] * scale


def _flash_bwd_pallas(scale, bq, bk, res, do, interpret=False):
    """Two-pass Pallas flash backward (dKV kernel + dQ kernel).

    Recomputes P = exp(S - lse) inside each kernel, so no [Nq, Nk] tensor
    ever reaches HBM (the XLA fallback materializes [BH, Nq, 512] prob
    chunks per scan step — HBM-bandwidth-bound at training shapes). Masked
    kv positions need no mask operand: K rows are pre-zeroed (killing their
    dQ contribution exactly) and dK/dV are masked after the kernels.
    """
    qf, kf, vf, maskf, o, lse = res
    f32 = jnp.float32
    in_dt = qf.dtype
    BH, Nq_p, Dp = qf.shape
    Nk_p = kf.shape[1]
    Dvp = vf.shape[2]
    do_c = do.astype(in_dt)
    mask_col = maskf[:, 0, :, None] > 0                    # [BH, Nk_p, 1]
    kz = jnp.where(mask_col, kf, jnp.zeros((), in_dt))
    # lse/D ride as [BH, 1, Nq] so their block shape is (1, bq) against a
    # (1, Nq) trailing pair — the TPU lowering's divisible-or-equal rule on
    # the last two dims rejects a (1, bq) block over [BH, Nq] when BH > 1
    # (multi-object training hit this; 1-object @1024 masked it).
    dvec = jnp.sum(do.astype(f32) * o.astype(f32), axis=-1)[:, None, :]
    lse2 = lse.astype(f32)[:, None, :]                     # [BH, 1, Nq_p]

    # The fwd block sizes always divide the padded lengths; prefer 512-wide
    # bwd blocks (scratch holds [bk, bq] fp32 tiles x3 plus two accumulators).
    bqb = 512 if Nq_p % 512 == 0 else bq
    bkb = 512 if Nk_p % 512 == 0 else bk
    nI, nJ = Nq_p // bqb, Nk_p // bkb

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, num_q_blocks=nI),
        grid=(BH, nJ, nI),
        in_specs=[
            pl.BlockSpec((1, bqb, Dp), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bqb, Dvp), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, bqb), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, 1, bqb), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, bkb, Dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bkb, Dvp), lambda b, j, i: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bkb, Dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bkb, Dvp), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Nk_p, Dp), f32),
            jax.ShapeDtypeStruct((BH, Nk_p, Dvp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkb, Dp), f32),
            pltpu.VMEM((bkb, Dvp), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, do_c, lse2, dvec, kz, vf)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, num_kv_blocks=nJ),
        grid=(BH, nI, nJ),
        in_specs=[
            pl.BlockSpec((1, bkb, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bkb, Dvp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bqb, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bqb, Dvp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, bqb), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bqb), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, bqb, Dp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Nq_p, Dp), f32),
        scratch_shapes=[pltpu.VMEM((bqb, Dp), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kz, vf, qf, do_c, lse2, dvec)

    dk = jnp.where(mask_col, dk, 0.0)
    dv = jnp.where(mask_col, dv, 0.0)
    return (dq.astype(qf.dtype), dk.astype(kf.dtype), dv.astype(vf.dtype),
            jnp.zeros_like(maskf))


def _flash_bwd(scale, bq, bk, res, do):
    """custom_vjp backward: Pallas kernels on TPU, XLA recompute elsewhere.
    MEDSAM2_FLASH_BWD forces a path ("pallas" runs the kernels in interpret
    mode off-TPU — used by the grad-parity tests)."""
    import os

    mode = os.environ.get("MEDSAM2_FLASH_BWD", "auto")
    on_tpu = jax.default_backend() == "tpu"
    if mode == "xla":
        return _flash_bwd_xla(scale, bq, bk, res, do)
    if mode == "pallas":
        return _flash_bwd_pallas(scale, bq, bk, res, do, interpret=not on_tpu)
    # The kernels need lane-aligned [1, block] LSE/D rows (512-wide bwd
    # blocks); odd small shapes (only reachable via force="flash") keep the
    # XLA path.
    aligned = (res[0].shape[1] % 512 == 0 and res[1].shape[1] % 512 == 0)
    if on_tpu and aligned:
        return _flash_bwd_pallas(scale, bq, bk, res, do)
    return _flash_bwd_xla(scale, bq, bk, res, do)


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(q, k, v, kv_mask=None, scale=None, block_q=512, block_k=512):
    """Pallas TPU flash attention. q [B,H,Nq,D], k [B,H,Nk,D], v [B,H,Nk,Dv]
    (Dv may differ from D — the low-rank value path), kv_mask [B,Nk].

    Differentiable: the forward runs the Pallas kernel (also emitting per-row
    LSE); the backward is a kv-chunked XLA recomputation (custom_vjp), so the
    training path can keep the fast kernel instead of falling back to the
    math SDPA."""
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    Dv = v.shape[3]
    if scale is None:
        scale = 1.0 / math.sqrt(D)  # scale by the true head dim before padding
    if kv_mask is None:
        kv_mask = jnp.ones((B, Nk), jnp.float32)
    else:
        kv_mask = kv_mask.astype(jnp.float32)

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

    out = _flash(qf, kf, vf, maskf, scale, bq, bk)
    return out[:, :Nq, :Dv].reshape(B, H, Nq, Dv)


def _kv_cached_kernel(row_ref, q_ref, kc_ref, pos_ref, pk_ref, v_ref, pv_ref,
                      mask_ref, o_ref, m_scratch, l_scratch, acc_scratch, *,
                      scale, num_kv_blocks):
    """Online-softmax cross-attention over the memory bank IN STORAGE ORDER.

    Each kv block is assembled in VMEM as ``k = kcache_slot + pos_row`` (the
    write-time roped memory keys plus the session-static positional keys,
    selected per block via the scalar-prefetched ``row_ref``); the final block
    instead carries the per-frame object-pointer keys/values. Nothing large is
    ever gathered, concatenated, or re-ordered in HBM — the XLA lowering of
    the same math moved ~420 MB/frame of copies at the 1024-px memory shape.
    Fully-masked blocks (stale ring slots, pointer padding) skip their dots.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    mask = mask_ref[0]                        # [1, bk] (>0 = valid)

    @pl.when(jnp.any(mask > 0))
    def _block():
        q = q_ref[0]                          # [bq, D]
        is_ptr = j == num_kv_blocks - 1
        k = jnp.where(is_ptr, pk_ref[0], kc_ref[0, 0, 0] + pos_ref[0, 0])
        v = jnp.where(is_ptr, pv_ref[0], v_ref[0, 0])
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask > 0, s, _NEG_INF)

        m_prev = m_scratch[:]
        l_prev = l_scratch[:]
        m_next = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_next) * mask
        alpha = jnp.exp(m_prev - m_next)
        l_scratch[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scratch[:] = m_next

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        l = l_scratch[:]
        lz = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / lz).astype(o_ref.dtype)


def kv_cached_attention_xla(q, kcache, pos_rows, row_of_slot, ptr_k, v_slots,
                            ptr_v, kv_mask, layer: int, scale):
    """XLA reference of the storage-order cached cross-attention (also the
    CPU/parity path): materializes k = kcache[:, :, layer] + pos_rows[rows]
    and defers to :func:`sdpa_xla`. Semantically identical to the kernel."""
    B, F, L, P, C = kcache.shape
    Dv = v_slots.shape[-1]
    k_sp = kcache[:, :, layer] + pos_rows[row_of_slot, layer][None].astype(kcache.dtype)
    k = jnp.concatenate([k_sp.reshape(B, F * P, C),
                         ptr_k.astype(kcache.dtype)], axis=1)
    v = jnp.concatenate([v_slots.reshape(B, F * P, Dv), ptr_v], axis=1)
    out = sdpa_xla(q[:, None], k[:, None].astype(q.dtype),
                   v[:, None].astype(q.dtype), kv_mask=kv_mask, scale=scale)
    return out[:, 0]


def kv_cached_attention(q, kcache, pos_rows, row_of_slot, ptr_k, v_slots,
                        ptr_v, kv_mask, layer: int, scale=None,
                        block_q: Optional[int] = None,
                        block_k: Optional[int] = None,
                        force: Optional[str] = None):
    """Cross-attention against the memory bank's roped-key cache in storage
    order (single kv head).

    q [B, Nq, C]; kcache [B, F, L, P, C] (bank buffer, slots as stored);
    pos_rows [Rr, L, P, C] session-static positional keys; row_of_slot [F]
    int32 (pos row per slot, see ``memory_bank.kv_storage_layout``);
    ptr_k [B, Nptr, C] per-frame object-pointer keys (already projected, no
    RoPE); v_slots [B, F, P, Dv] raw memory features (low-rank values);
    ptr_v [B, Nptr, Dv]; kv_mask [B, F*P + Nptr] (True = attend).
    Returns [B, Nq, Dv]. Inference-only (no vjp on the kernel path).
    """
    B, F, L, P, C = kcache.shape
    Nq = q.shape[1]
    Nptr = ptr_k.shape[1]
    Dv = v_slots.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(C)
    # Block-shape sweep knobs (see scripts/profile_kv_storage.py): bigger bq
    # re-reads the cache fewer times per layer, bigger bk amortizes the
    # online-softmax rescale; p-matrix VMEM = bq*bk*4 bytes bounds the pair.
    if block_q is None:
        block_q = int(os.environ.get("MEDSAM2_KV_BQ", "1024"))
    if block_k is None:
        block_k = int(os.environ.get("MEDSAM2_KV_BK", "1024"))

    interpret = force == "interpret"
    use_kernel = interpret or (
        force != "xla" and jax.default_backend() == "tpu")

    def divisor_block(n, want, align):
        """Largest aligned divisor of n that is <= want (blocks must tile the
        buffer exactly; e.g. P=2304 at 768 px has no 1024 divisor -> 768)."""
        for b in range(min(want, n), 0, -1):
            if n % b == 0 and b % align == 0:
                return b
        return 0

    bk = divisor_block(P, block_k, 128 if not interpret else 8)
    bq = divisor_block(Nq, block_q, 8)
    if not use_kernel or bk == 0 or bq == 0 or Nptr > bk:
        return kv_cached_attention_xla(q, kcache, pos_rows, row_of_slot,
                                       ptr_k, v_slots, ptr_v, kv_mask, layer,
                                       scale)

    ppb = P // bk
    num_kv_blocks = F * ppb + 1
    # pad mask so the ptr block is bk wide (mask length F*P + Nptr -> + bk)
    maskf = kv_mask.astype(jnp.float32)[:, None, :]
    want = F * P + bk
    if maskf.shape[2] != want:
        maskf = jnp.pad(maskf, ((0, 0), (0, 0), (0, want - maskf.shape[2])))
    pk = _pad_to(ptr_k.astype(q.dtype), 1, bk)
    pv = _pad_to(ptr_v.astype(q.dtype), 1, bk)

    li = int(layer)
    grid = (B, Nq // bq, num_kv_blocks)

    def slot_of(j):
        return jnp.minimum(j // ppb, F - 1)

    out = pl.pallas_call(
        functools.partial(_kv_cached_kernel, scale=scale,
                          num_kv_blocks=num_kv_blocks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, C), lambda b, i, j, rows: (b, i, 0)),
                pl.BlockSpec((1, 1, 1, bk, C),
                             lambda b, i, j, rows: (b, slot_of(j), li, j % ppb, 0)),
                pl.BlockSpec((1, 1, bk, C),
                             lambda b, i, j, rows: (rows[j], li, j % ppb, 0)),
                pl.BlockSpec((1, bk, C), lambda b, i, j, rows: (b, 0, 0)),
                pl.BlockSpec((1, 1, bk, Dv),
                             lambda b, i, j, rows: (b, slot_of(j), j % ppb, 0)),
                pl.BlockSpec((1, bk, Dv), lambda b, i, j, rows: (b, 0, 0)),
                pl.BlockSpec((1, 1, bk), lambda b, i, j, rows: (b, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, bq, Dv), lambda b, i, j, rows: (b, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, Dv), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Nq, Dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        # per-kv-block pos row: slot rows repeated per block + the ptr block
        jnp.concatenate([jnp.repeat(row_of_slot.astype(jnp.int32), ppb),
                         jnp.zeros((1,), jnp.int32)]),
        q, kcache, pos_rows, pk, v_slots, pv, maskf,
    )
    return out


def _use_flash(q_len: int, kv_len: int, head_dim: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # Flash pays off for long sequences; tiny decoder/window attentions stay
    # on XLA. Gate at 1024: the 512-px streaming memory cross-attention
    # (q=1024, kv~7.2k, d256/dv64) runs 127 TF/s with 1024/1024 blocks
    # (scripts/profile_crossattn_512.py) while the XLA path was previously
    # below the measurement floor — and the 4096^2 d96 encoder shape already
    # needed flash (XLA SDPA collapses to ~13 TF/s on logits traffic).
    return q_len >= 1024 and kv_len >= 1024 and head_dim >= 64


def _flash_blocks(q_len: int, kv_len: int, dv: int = 0, itemsize: int = 4,
                  bh: int = 1):
    """Measured on v5e (scripts/calibrate_overhead.py, profile_crossattn.py):
    long-kv cross attention prefers tall q blocks; with low-rank values
    (dv <= 128) the smaller V/acc footprint lets the kv block double to 1024,
    which is the fastest config (0.585 ms vs 0.748 at the @1024 memory shape —
    dv256 OOMs VMEM there); square self/global attention prefers wide kv
    blocks (512/1024).

    ``bh`` (batch*heads): at bh >= 4 the 2048-tall q block overflows the
    16 MB scoped VMEM by ~0.2 MB at the @1024 memory shape (measured:
    4-object propagation OOM'd where 1-2 objects fit) — drop to 1024."""
    if kv_len >= 2 * q_len:
        bq_tall = 2048 if bh < 4 else 1024
        if dv and dv <= 128 and itemsize <= 2:
            bq, bk = bq_tall, 1024   # only fits VMEM for 2-byte inputs
        else:
            bq, bk = bq_tall, 512
    else:
        bq, bk = 512, 1024
    # never pad a sequence past its 512-aligned length just to fill a block
    # (q=1024 with bq=2048 would double the q work; measured best there is
    # 1024/1024 — scripts/profile_crossattn_512.py)
    bq = min(bq, max(512, -(-q_len // 512) * 512))
    bk = min(bk, max(512, -(-kv_len // 512) * 512))
    return bq, bk


def attention(q, k, v, kv_mask=None, scale=None, force: Optional[str] = None):
    """Dispatch to the flash kernel or the XLA path.

    ``force``: "flash" | "xla" | None (auto).
    """
    if force == "flash" or (force is None and _use_flash(q.shape[2], k.shape[2], q.shape[3])):
        bq, bk = _flash_blocks(q.shape[2], k.shape[2], v.shape[3],
                               jnp.dtype(q.dtype).itemsize,
                               bh=q.shape[0] * q.shape[1])
        return flash_attention(q, k, v, kv_mask=kv_mask, scale=scale,
                               block_q=bq, block_k=bk)
    return sdpa_xla(q, k, v, kv_mask=kv_mask, scale=scale)

"""Fully-fused windowed MultiScaleBlock Pallas kernel.

One kernel runs the ENTIRE plain windowed hiera block
(``hieradet.py:136-168`` with ``dim == dim_out`` and no q-pooling):

    x + proj(window_attn(qkv(LN1(x))))  ->  + mlp(LN2(.))

on the chained-window 2D layout: the input is ``[N, C]`` where every
consecutive ``n = ws*ws`` rows are one attention window (exactly the
contiguous reshape of ``_block_apply_windows``'s ``[Bn, ws, ws, C]``).
XLA's lowering materializes ~10 x-sized tensors in HBM per block (normed,
q/k/v, attention out, proj out, residual, normed2, 4x hidden, out); the
kernel keeps everything in VMEM — HBM traffic drops to one read of x, one
write of y, plus the (tiny) weights per grid step.

Window attention is computed as ONE block-diagonal masked attention over the
row block (R rows = R/n windows): logits outside the diagonal ``n x n``
blocks are set to -1e30 before the fp32 softmax, which is *exactly* the
per-window softmax (the masked terms underflow to 0.0 and adding zeros is
exact), while keeping every dot a plain rank-2 MXU matmul. The extra logits
FLOPs are ~R/n-fold but attention here is <10% of the block's matmul work —
these blocks are bandwidth-bound, which is the point.

Exact-math contract (pinned by tests/test_fused_block.py against
``hiera._block_apply_windows``):
- LN statistics fp32, biased variance, eps inside rsqrt — as
  ``layers.layer_norm_apply`` (eps=1e-6).
- matmuls accumulate fp32 (``preferred_element_type``), cast to x.dtype
  before bias add — as ``layers.linear_apply``.
- attention: fp32 logits, ``1/sqrt(d)`` scale, fp32 softmax, probs cast to
  x.dtype, fp32-accumulated PV — as ``ops.attention.sdpa_xla``.
- GELU: tanh approx for bf16/fp16, erf for fp32 — as ``layers.gelu``.

The wrapper is a ``jax.custom_vjp`` whose backward re-runs the reference XLA
lowering under ``jax.vjp`` (the 3D recipe freezes the trunk; 2D training
recomputes — the same trade ``enc_saved`` remat already makes).

Gating: ``fused_block_enabled()`` — default OFF until the in-graph A/B on
the real chip is positive (scripts/profile_fused_mlp.py --block measures;
the round-4 lesson is that Pallas adjacent to convs can trigger relayouts,
though the 2D row-layout operands here sidestep the rank-4 tile war).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medsam2_tpu.core import layers

_NEG_INF = -1e30  # python scalar: a jnp constant would be captured by the kernel


def fused_block_enabled() -> bool:
    return os.environ.get("MEDSAM2_FUSED_BLOCK", "0") == "1"


def _reference(x2d, bp, num_heads: int, n: int, eps: float = 1e-6):
    """The exact library lowering of one plain windowed block on the
    window-contiguous 2D layout (mirrors ``hiera._block_apply_windows`` +
    ``_attention_block`` with ``sdpa_xla``)."""
    from medsam2_tpu.ops.attention import sdpa_xla

    N, C = x2d.shape
    d = C // num_heads
    normed = layers.layer_norm_apply(bp["norm1"], x2d, eps=eps)
    qkv = layers.linear_apply(bp["attn"]["qkv"], normed)  # [N, 3C]
    qkv = qkv.reshape(N // n, n, 3, num_heads, d)
    q, k, v = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
    out = sdpa_xla(q, k, v)                                # [W, h, n, d]
    out = out.transpose(0, 2, 1, 3).reshape(N, C)
    x2d = x2d + layers.linear_apply(bp["attn"]["proj"], out)
    return x2d + layers.mlp_apply(
        bp["mlp"], layers.layer_norm_apply(bp["norm2"], x2d, eps=eps),
        activation=layers.gelu)


def _ln(xf, g_ref, b_ref, eps):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)


def _kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
            g2_ref, b2_ref, w1_ref, b1m_ref, w2_ref, b2m_ref, o_ref, *,
            eps: float, num_heads: int, n: int):
    x = x_ref[:]
    R, C = x.shape
    d = C // num_heads
    dt = x.dtype

    normed = _ln(x.astype(jnp.float32), g1_ref, b1_ref, eps).astype(dt)
    qkv = jnp.dot(normed, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv.astype(dt) + bqkv_ref[:]

    # block-diagonal window mask: row i attends iff same n-token window
    row = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // n
    col = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // n
    same = row == col
    scale = jnp.float32(1.0 / (d ** 0.5))

    acc = jnp.zeros((R, C), jnp.float32)
    for h in range(num_heads):
        qh = jax.lax.slice(qkv, (0, h * d), (R, h * d + d))
        kh = jax.lax.slice(qkv, (0, C + h * d), (R, C + h * d + d))
        vh = jax.lax.slice(qkv, (0, 2 * C + h * d), (R, 2 * C + h * d + d))
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(same, s * scale, jnp.float32(_NEG_INF))
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        oh = jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32).astype(dt)
        # per-head slice of the output projection: sum_h oh @ Wp[h*d:(h+1)*d]
        wph = jax.lax.slice(wp_ref[:], (h * d, 0), (h * d + d, C))
        acc = acc + jnp.dot(oh, wph, preferred_element_type=jnp.float32)
    x = x + acc.astype(dt) + bp_ref[:]

    normed2 = _ln(x.astype(jnp.float32), g2_ref, b2_ref, eps).astype(dt)
    hdn = jnp.dot(normed2, w1_ref[:], preferred_element_type=jnp.float32)
    hdn = hdn.astype(dt) + b1m_ref[:]
    if dt in (jnp.float32, jnp.float64):
        hdn = jax.nn.gelu(hdn, approximate=False)
    else:
        hdn = jax.nn.gelu(hdn, approximate=True)
    y = jnp.dot(hdn, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = x + y.astype(dt) + b2m_ref[:]


def _pick_rows(N: int, n: int, C: int) -> int:
    # R must divide N, be a multiple of the window seq n, and keep the fp32
    # [R, R] logits + bf16 activations comfortably inside the 16 MB VMEM.
    for r in (1024, 512, 256, 128, 64, 32, 16):
        if r % n == 0 and N % r == 0 and r * r * 4 <= 4 << 20:
            return r
    return 0


def _pallas_fwd(x2d, bp, num_heads, n, eps, interpret=False):
    N, C = x2d.shape
    H = bp["mlp"]["layers"][0]["w"].shape[1]
    R = _pick_rows(N, n, C)
    assert R, f"N={N}, n={n} has no aligned row block"
    dt = x2d.dtype
    row2 = lambda a: a.reshape(1, -1).astype(dt)
    wcast = lambda a: a.astype(dt)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, num_heads=num_heads, n=n),
        out_shape=jax.ShapeDtypeStruct((N, C), dt),
        grid=(N // R,),
        in_specs=[
            pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((1, C)), full((1, C)),
            full((C, 3 * C)), full((1, 3 * C)),
            full((C, C)), full((1, C)),
            full((1, C)), full((1, C)),
            full((C, H)), full((1, H)),
            full((H, C)), full((1, C)),
        ],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * C * (3 * C + C + 2 * H) + 4 * N * R * C,
            transcendentals=N * (H + R),
            bytes_accessed=2 * N * C * dt.itemsize),
        interpret=interpret,
    )(x2d,
      row2(bp["norm1"]["scale"]), row2(bp["norm1"]["bias"]),
      wcast(bp["attn"]["qkv"]["w"]), row2(bp["attn"]["qkv"]["b"]),
      wcast(bp["attn"]["proj"]["w"]), row2(bp["attn"]["proj"]["b"]),
      row2(bp["norm2"]["scale"]), row2(bp["norm2"]["bias"]),
      wcast(bp["mlp"]["layers"][0]["w"]), row2(bp["mlp"]["layers"][0]["b"]),
      wcast(bp["mlp"]["layers"][1]["w"]), row2(bp["mlp"]["layers"][1]["b"]))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_block(x2d, bp, num_heads, n, eps):
    return _pallas_fwd(x2d, bp, num_heads, n, eps)


def _fused_block_fwd(x2d, bp, num_heads, n, eps):
    return _fused_block(x2d, bp, num_heads, n, eps), (x2d, bp)


def _fused_block_bwd(num_heads, n, eps, res, g):
    x2d, bp = res
    _, vjp = jax.vjp(lambda a, p: _reference(a, p, num_heads, n, eps), x2d, bp)
    return vjp(g)


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_window_block_supported(bp, spec, wins_shape) -> bool:
    """True when the fused kernel covers this block: plain windowed block
    (no q-pooling, no dim change), qkv/proj/mlp biases present, and the
    window-contiguous row count tiles evenly."""
    if spec["q_stride"] is not None or spec["dim"] != spec["dim_out"]:
        return False
    if "b" not in bp["attn"]["qkv"] or "b" not in bp["attn"]["proj"]:
        return False
    mlp = bp["mlp"]["layers"]
    if len(mlp) != 2 or "b" not in mlp[0] or "b" not in mlp[1]:
        return False
    Bn, ws, ws2, C = wins_shape
    if ws != ws2 or C % spec["num_heads"]:
        return False
    return _pick_rows(Bn * ws * ws, ws * ws, C) != 0


def fused_window_block(wins, bp, spec, eps: float = 1e-6):
    """One plain windowed MultiScaleBlock on pre-partitioned windows
    ``[Bn, ws, ws, C]`` via the fused kernel (caller checks
    :func:`fused_window_block_supported`)."""
    Bn, ws, _, C = wins.shape
    y = _fused_block(wins.reshape(-1, C), bp, spec["num_heads"], ws * ws, eps)
    return y.reshape(Bn, ws, ws, C)

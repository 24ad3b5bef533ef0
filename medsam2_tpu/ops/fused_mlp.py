"""Fused LayerNorm -> MLP(up, GELU, down) -> +residual Pallas kernel.

Targets the encoder's bandwidth-bound MLP tail (``hieradet.py:136-168``'s
``x + mlp(norm2(x))``): XLA materializes the normed activations and the 4x
hidden activations in HBM (~125 MB/frame for hiera_t stage 1 @1024), while
this kernel keeps both in VMEM — HBM traffic drops to one read of x, one
write of y, plus the (tiny, grid-invariant) weights.

Exact-math contract (pinned by tests/test_fused_mlp.py):
- LN statistics in fp32, biased variance, ``rsqrt(var + eps)``, scale/bias
  applied in fp32, cast to x.dtype — identical to
  ``layers.layer_norm_apply``.
- matmuls accumulate fp32 (HIGHEST/preferred_element_type), outputs cast to
  x.dtype before bias add — identical to ``layers.linear_apply``.
- GELU: tanh approximation for bf16/fp16, exact erf for fp32 — identical to
  ``layers.gelu``.

The wrapper is a ``jax.custom_vjp`` whose backward re-runs the reference XLA
lowering under ``jax.vjp`` (the 3D recipe freezes the trunk, so propagation
never differentiates this; 2D training recomputes — the same trade
``enc_saved`` remat already makes).

Gating: ``fused_mlp_enabled()`` — default OFF until the in-graph A/B on the
real chip is positive (the round-4 lesson: Pallas kernels adjacent to convs
can trigger whole-program relayouts; scripts/profile_fused_mlp.py measures).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medsam2_tpu.core import layers


def fused_mlp_enabled() -> bool:
    return os.environ.get("MEDSAM2_FUSED_MLP", "0") == "1"


def _max_channels() -> int:
    """Channel cap for the fused path: the kernel targets the
    bandwidth-bound early stages (hiera_t C=96/192 at 65k/16k tokens); the
    matmul-bound late stages (C=384/768 at 4k/1k tokens) keep XLA's fused
    matmul+GELU lowering. 0 = no cap."""
    return int(os.environ.get("MEDSAM2_FUSED_MLP_MAXC", "0"))


def _reference(x2d, norm_p, mlp_p, eps):
    y = layers.layer_norm_apply(norm_p, x2d, eps=eps)
    return x2d + layers.mlp_apply(mlp_p, y, activation=layers.gelu)


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            eps: float):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    normed = normed * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    normed = normed.astype(x.dtype)

    h = jnp.dot(normed, w1_ref[:], preferred_element_type=jnp.float32)
    h = h.astype(x.dtype) + b1_ref[:]
    if x.dtype in (jnp.float32, jnp.float64):
        h = jax.nn.gelu(h, approximate=False)
    else:
        h = jax.nn.gelu(h, approximate=True)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = x + y.astype(x.dtype) + b2_ref[:]


def _pick_block(n: int) -> int:
    for bn in (1024, 512, 256, 128):
        if n % bn == 0:
            return bn
    return 0


def _pallas_fwd(x2d, gamma, beta, w1, b1, w2, b2, eps, interpret=False):
    N, C = x2d.shape
    H = w1.shape[1]
    bn = _pick_block(N)
    assert bn, f"N={N} has no aligned row block"
    dt = x2d.dtype
    row2 = lambda a: a.reshape(1, -1).astype(dt)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((N, C), dt),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((bn, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * C * H, transcendentals=N * H,
            bytes_accessed=2 * N * C * dt.itemsize + 2 * C * H * dt.itemsize),
        interpret=interpret,
    )(x2d, row2(gamma), row2(beta), w1.astype(dt), row2(b1), w2.astype(dt),
      row2(b2))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_mlp_res(x2d, norm_p, mlp_p, eps):
    gamma, beta = norm_p["scale"], norm_p["bias"]
    (l1, l2) = mlp_p["layers"]
    return _pallas_fwd(x2d, gamma, beta, l1["w"], l1["b"], l2["w"], l2["b"], eps)


def _ln_mlp_res_fwd(x2d, norm_p, mlp_p, eps):
    return _ln_mlp_res(x2d, norm_p, mlp_p, eps), (x2d, norm_p, mlp_p)


def _ln_mlp_res_bwd(eps, res, g):
    x2d, norm_p, mlp_p = res
    _, vjp = jax.vjp(lambda a, n, m: _reference(a, n, m, eps), x2d, norm_p, mlp_p)
    return vjp(g)


_ln_mlp_res.defvjp(_ln_mlp_res_fwd, _ln_mlp_res_bwd)


def ln_mlp_residual(x, norm_p, mlp_p, eps: float = 1e-6):
    """``x + mlp(layer_norm(x))`` for any leading shape [..., C].

    Uses the fused Pallas kernel when enabled, on TPU, with a 2-layer MLP and
    row counts that tile evenly; otherwise the reference XLA lowering."""
    C = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= int(d)
    maxc = _max_channels()
    use = (fused_mlp_enabled()
           and jax.default_backend() == "tpu"
           and len(mlp_p["layers"]) == 2
           and "b" in mlp_p["layers"][0] and "b" in mlp_p["layers"][1]
           and _pick_block(rows) != 0
           and (maxc == 0 or C <= maxc))
    if not use:
        return x + layers.mlp_apply(
            mlp_p, layers.layer_norm_apply(norm_p, x, eps=eps),
            activation=layers.gelu)
    lead = x.shape[:-1]
    y = _ln_mlp_res(x.reshape(-1, C), norm_p, mlp_p, eps)
    return y.reshape(*lead, C)

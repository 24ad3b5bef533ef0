"""Parity for the fully-fused windowed-block Pallas kernel (interpret mode —
the compiled kernel runs only on TPU) against the exact library lowering
(``hiera._block_apply_windows`` with the XLA attention path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medsam2_tpu.configs import HieraConfig
from medsam2_tpu.core import hiera
from medsam2_tpu.ops import fused_block


def _block_params(rng, C, num_heads, mlp_ratio=4.0):
    def lin(i, o):
        return {"w": jnp.asarray(rng.standard_normal((i, o)) * (i ** -0.5),
                                 jnp.float32),
                "b": jnp.asarray(rng.standard_normal(o) * 0.02, jnp.float32)}

    H = int(C * mlp_ratio)
    return {
        "norm1": {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal(C), jnp.float32),
                  "bias": jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)},
        "attn": {"qkv": lin(C, 3 * C), "proj": lin(C, C)},
        "norm2": {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal(C), jnp.float32),
                  "bias": jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)},
        "mlp": {"layers": [lin(C, H), lin(H, C)]},
    }


@pytest.mark.parametrize("dtype,Bn,ws,C,heads,tol", [
    (jnp.float32, 16, 8, 96, 1, 1e-4),      # hiera_t stage-1 shape (scaled)
    (jnp.float32, 48, 4, 192, 2, 1e-4),     # stage-2: multi-head, ragged rows
    (jnp.bfloat16, 16, 8, 96, 1, 3e-2),
])
def test_fused_block_matches_reference(rng, dtype, Bn, ws, C, heads, tol):
    bp = _block_params(rng, C, heads)
    wins = jnp.asarray(rng.standard_normal((Bn, ws, ws, C)), dtype)
    spec = {"dim": C, "dim_out": C, "num_heads": heads,
            "window_size": ws, "q_stride": None}
    assert fused_block.fused_window_block_supported(bp, spec, wins.shape)

    ref = hiera._block_apply_windows(bp, wins, spec)
    got = fused_block._pallas_fwd(
        wins.reshape(-1, C), bp, heads, ws * ws, 1e-6, interpret=True
    ).reshape(wins.shape)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=tol, atol=tol)


def test_reference_2d_matches_block_apply_windows(rng):
    """The kernel's own XLA reference (used by the custom-vjp backward) must
    equal the library block on the window-contiguous layout."""
    C, heads, ws, Bn = 96, 1, 8, 8
    bp = _block_params(rng, C, heads)
    wins = jnp.asarray(rng.standard_normal((Bn, ws, ws, C)), jnp.float32)
    spec = {"dim": C, "dim_out": C, "num_heads": heads,
            "window_size": ws, "q_stride": None}
    ref = hiera._block_apply_windows(bp, wins, spec)
    got = fused_block._reference(wins.reshape(-1, C), bp, heads, ws * ws
                                 ).reshape(wins.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_unsupported_shapes_fall_through():
    spec_pool = {"dim": 96, "dim_out": 192, "num_heads": 1,
                 "window_size": 8, "q_stride": (2, 2)}
    bp = _block_params(np.random.default_rng(0), 96, 1)
    assert not fused_block.fused_window_block_supported(
        bp, spec_pool, (16, 8, 8, 96))
    # ws14 windows (n=196) have no aligned row block
    spec14 = {"dim": 384, "dim_out": 384, "num_heads": 4,
              "window_size": 14, "q_stride": None}
    bp14 = _block_params(np.random.default_rng(1), 384, 4)
    assert not fused_block.fused_window_block_supported(
        bp14, spec14, (4, 14, 14, 384))


def test_custom_vjp_matches_reference_grads(rng):
    C, heads, ws = 96, 1, 4
    bp = _block_params(rng, C, heads)
    x = jnp.asarray(rng.standard_normal((128, C)), jnp.float32)
    n = ws * ws

    def loss_ref(a, p):
        return jnp.sum(fused_block._reference(a, p, heads, n) ** 2)

    def loss_fused(a, p):
        return jnp.sum(fused_block._fused_block(a, p, heads, n, 1e-6) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, bp)
    orig = fused_block._pallas_fwd
    fused_block._pallas_fwd = lambda *a, **k: orig(*a, interpret=True)
    try:
        g_fused = jax.grad(loss_fused, argnums=(0, 1))(x, bp)
    finally:
        fused_block._pallas_fwd = orig
    # the cotangent is 2*y with y from the kernel vs the reference, whose
    # accumulation orders differ (block-diag 128-row dots vs per-window 16-row
    # dots) — gradients match to that fp32 forward noise, not bit-exactly
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_hiera_gate_off_on_cpu(rng, monkeypatch):
    """With the flag on but off-TPU, hiera_apply must take the XLA path and
    match the flag-off output bit-for-bit."""
    monkeypatch.setenv("MEDSAM2_FUSED_BLOCK", "1")
    cfg = HieraConfig(embed_dim=32, num_heads=1, stages=(1, 2, 2, 1),
                      window_spec=(8, 4, 14, 7),
                      global_att_blocks=(4,),
                      window_pos_embed_bkg_spatial_size=(7, 7))
    params = hiera.hiera_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    on = hiera.hiera_apply(params, cfg, x)
    monkeypatch.setenv("MEDSAM2_FUSED_BLOCK", "0")
    off = hiera.hiera_apply(params, cfg, x)
    for a, b in zip(on, off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

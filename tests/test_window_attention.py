"""Fused multi-window attention kernel vs the reference per-window SDPA
(interpret mode — the compiled kernel runs only on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from medsam2_tpu.core import layers
from medsam2_tpu.ops.attention import sdpa_xla
from medsam2_tpu.ops.window_attention import window_attention, _pack_factor


def _reference_window_attention(qkv, num_heads, ws):
    """The XLA path: partition -> per-window SDPA -> unpartition."""
    B, H, W, C3 = qkv.shape
    C = C3 // 3
    xw, pad_hw = layers.window_partition(qkv, ws)       # [B*G, ws, ws, 3C]
    BG = xw.shape[0]
    n = ws * ws
    t = xw.reshape(BG, n, 3, num_heads, C // num_heads)
    q, k, v = (t[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    out = sdpa_xla(q, k, v).transpose(0, 2, 1, 3).reshape(BG, ws, ws, C)
    return layers.window_unpartition(out, ws, pad_hw, (H, W))


@pytest.mark.parametrize("ws,heads,HW", [(4, 1, 8), (4, 2, 16), (8, 1, 16),
                                         (2, 4, 14)])
def test_window_attention_kernel_matches_sdpa(ws, heads, HW):
    rng = np.random.default_rng(0)
    C = 32 * heads
    qkv = jnp.asarray(rng.standard_normal((2, HW, HW, 3 * C)).astype(np.float32))
    # pad like the hiera block does
    ph = (ws - HW % ws) % ws
    qkvp = jnp.pad(qkv, ((0, 0), (0, ph), (0, ph), (0, 0)))
    got = window_attention(qkvp, heads, ws, interpret=True)[:, :HW, :HW]
    want = _reference_window_attention(qkvp, heads, ws)[:, :HW, :HW]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_pack_factor():
    assert _pack_factor(8) == 2     # n=64 -> two windows per 128-lane tile
    assert _pack_factor(4) == 8     # n=16
    assert _pack_factor(14) == 1    # n=196 > 128
    assert _pack_factor(7) == 2     # n=49


def test_window_attention_packed_mask_exactness():
    """Packed tiles must not leak attention across windows: identical tokens
    in different windows with distinct values stay distinct."""
    rng = np.random.default_rng(1)
    ws, heads, C = 4, 1, 32
    H = W = 8  # 4 windows, pack=8 collapses to pack=2 (W/pw constraint)
    qkv = rng.standard_normal((1, H, W, 3 * C)).astype(np.float32)
    got = window_attention(jnp.asarray(qkv), heads, ws, interpret=True)
    want = _reference_window_attention(jnp.asarray(qkv), heads, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

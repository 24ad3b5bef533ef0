"""Numerical-parity tests for core primitives vs inline torch oracles.

The reference model is PyTorch; these tests build the torch op fresh from the
reference's documented semantics (not its code) and check our JAX primitives
match with shared weights.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from medsam2_tpu.core import layers
from medsam2_tpu.core import pos_enc


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    p = layers.layer_norm_init(64)
    p["scale"] = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    p["bias"] = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    got = np.asarray(layers.layer_norm_apply(p, jnp.asarray(x), eps=1e-6))
    want = F.layer_norm(torch.from_numpy(x), (64,),
                        torch.from_numpy(np.asarray(p["scale"])),
                        torch.from_numpy(np.asarray(p["bias"])), eps=1e-6).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_layer_norm_2d_matches_reference_semantics(rng):
    # LayerNorm2d normalizes the channel axis with biased variance and eps=1e-6
    # inside the sqrt (sam2_utils.py:137-149).
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    p = layers.layer_norm_init(16)
    got = np.asarray(layers.layer_norm_2d_apply(p, jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    u = xt.mean(1, keepdim=True)
    s = (xt - u).pow(2).mean(1, keepdim=True)
    want = ((xt - u) / torch.sqrt(s + 1e-6)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    wt = rng.standard_normal((8, 3, 7, 7)).astype(np.float32)  # OIHW
    b = rng.standard_normal(8).astype(np.float32)
    p = {"w": jnp.asarray(wt.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
    got = np.asarray(layers.conv2d_apply(p, jnp.asarray(x), stride=(4, 4), explicit_padding=(3, 3)))
    want = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(wt),
                    torch.from_numpy(b), stride=4, padding=3).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv_transpose2d_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    wt = rng.standard_normal((16, 4, 2, 2)).astype(np.float32)  # torch: (in, out, kh, kw)
    b = rng.standard_normal(4).astype(np.float32)
    p = {"w": jnp.asarray(wt.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
    got = np.asarray(layers.conv_transpose2d_apply(p, jnp.asarray(x), stride=(2, 2)))
    want = F.conv_transpose2d(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(wt),
                              torch.from_numpy(b), stride=2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("method,antialias,size", [
    ("bilinear", False, (32, 32)),   # upsample (FPN 2x)
    ("bilinear", False, (16, 16)),   # downsample no antialias (prompt embed 64->16)
    ("bilinear", True, (7, 7)),      # downsample antialias (mask prompts)
    ("nearest", False, (32, 32)),
    ("nearest", False, (10, 10)),
])
def test_interpolate_matches_torch(rng, method, antialias, size):
    x = rng.standard_normal((2, 14, 14, 3)).astype(np.float32)
    got = np.asarray(layers.interpolate(jnp.asarray(x), size, method=method, antialias=antialias))
    kwargs = {} if method == "nearest" else {"align_corners": False, "antialias": antialias}
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode=method,
                         **kwargs).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize("size", [(64, 64), (5, 9), (14, 14)])
def test_bicubic_np_matches_torch(rng, size):
    x = rng.standard_normal((7, 7, 3)).astype(np.float32)
    got = layers.bicubic_resize_np(x, *size)
    want = F.interpolate(torch.from_numpy(x).permute(2, 0, 1)[None], size=size,
                         mode="bicubic", align_corners=False)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 14, 18, 8)).astype(np.float32))
    win, pad_hw = layers.window_partition(x, 8)
    assert win.shape == (2 * 2 * 3, 8, 8, 8)
    back = layers.window_unpartition(win, 8, pad_hw, (14, 18))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 16, 16, 8)).astype(np.float32)
    got = np.asarray(layers.max_pool2d(jnp.asarray(x), (2, 2), (2, 2)))
    want = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


def test_mlp_matches_torch(rng):
    key = jax.random.PRNGKey(0)
    p = layers.mlp_init(key, 32, 64, 16, num_layers=3)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    got = np.asarray(layers.mlp_apply(p, jnp.asarray(x)))
    h = torch.from_numpy(x)
    for i, lp in enumerate(p["layers"]):
        w = torch.from_numpy(np.asarray(lp["w"]))
        b = torch.from_numpy(np.asarray(lp["b"]))
        h = h @ w + b
        if i < 2:
            h = torch.relu(h)
    np.testing.assert_allclose(got, h.numpy(), atol=1e-5)


def test_sine_pos_embed_matches_torch_reference(rng):
    # Oracle re-derived from PositionEmbeddingSine.forward (position_encoding.py:79-112)
    h, w, c = 9, 11, 64
    got = pos_enc.sine_pos_embed_grid(h, w, c)
    y_embed = torch.arange(1, h + 1, dtype=torch.float32).view(-1, 1).repeat(1, w)
    x_embed = torch.arange(1, w + 1, dtype=torch.float32).view(1, -1).repeat(h, 1)
    eps = 1e-6
    scale = 2 * np.pi
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    npf = c // 2
    dim_t = torch.arange(npf, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / npf)
    px = x_embed[:, :, None] / dim_t
    py = y_embed[:, :, None] / dim_t
    px = torch.stack((px[:, :, 0::2].sin(), px[:, :, 1::2].cos()), dim=3).flatten(2)
    py = torch.stack((py[:, :, 0::2].sin(), py[:, :, 1::2].cos()), dim=3).flatten(2)
    want = torch.cat((py, px), dim=2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rope_matches_torch_complex(rng):
    # Oracle: the complex-multiply formulation (position_encoding.py:174-216).
    dim, ex, ey = 64, 8, 8
    n = ex * ey
    q = rng.standard_normal((2, 1, n, dim)).astype(np.float32)
    cos, sin = pos_enc.axial_rope_cos_sin(dim, ex, ey)
    got = np.asarray(pos_enc.apply_rope(jnp.asarray(q), cos, sin))

    freqs = 1.0 / (10000.0 ** (torch.arange(0, dim, 4)[: dim // 4].float() / dim))
    t = torch.arange(n, dtype=torch.float32)
    t_x, t_y = t % ex, torch.div(t, ex, rounding_mode="floor").float()
    fx, fy = torch.outer(t_x, freqs), torch.outer(t_y, freqs)
    cis = torch.cat([torch.polar(torch.ones_like(fx), fx), torch.polar(torch.ones_like(fy), fy)], -1)
    qt = torch.from_numpy(q)
    q_ = torch.view_as_complex(qt.reshape(*qt.shape[:-1], -1, 2))
    want = torch.view_as_real(q_ * cis.view(1, 1, n, dim // 2)).flatten(3).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rope_repeat_tiles_tables(rng):
    dim, ex, ey = 16, 4, 4
    n = ex * ey
    k = rng.standard_normal((1, 1, 3 * n, dim)).astype(np.float32)
    cos, sin = pos_enc.axial_rope_cos_sin(dim, ex, ey)
    got = np.asarray(pos_enc.apply_rope(jnp.asarray(k), cos, sin, repeat=3))
    per = [np.asarray(pos_enc.apply_rope(jnp.asarray(k[:, :, i * n:(i + 1) * n]), cos, sin))
           for i in range(3)]
    np.testing.assert_allclose(got, np.concatenate(per, axis=2), atol=1e-6)


def test_attention_xla_matches_torch_sdpa(rng):
    from medsam2_tpu.ops.attention import sdpa_xla
    q = rng.standard_normal((2, 4, 10, 32)).astype(np.float32)
    k = rng.standard_normal((2, 4, 20, 32)).astype(np.float32)
    v = rng.standard_normal((2, 4, 20, 32)).astype(np.float32)
    got = np.asarray(sdpa_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flash_attention_interpret_matches_xla(rng):
    # Pallas kernel in interpret mode (CPU) vs the XLA path, incl. kv masking.
    from medsam2_tpu.ops import attention as attn_mod
    import functools
    from jax.experimental import pallas as pl

    q = jnp.asarray(rng.standard_normal((1, 2, 128, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 300, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 300, 64)).astype(np.float32))
    mask = jnp.asarray(rng.random(300) > 0.3)[None, :]

    orig = pl.pallas_call
    with jax.disable_jit():
        try:
            pl.pallas_call = functools.partial(orig, interpret=True)
            got = np.asarray(attn_mod.flash_attention(q, k, v, kv_mask=mask,
                                                      block_q=64, block_k=128))
        finally:
            pl.pallas_call = orig
    want = np.asarray(attn_mod.sdpa_xla(q, k, v, kv_mask=mask))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_conv3s2_wfold_matches_direct():
    """Width-folded 3x3/s2/p1 lowering == the direct conv, including the
    odd-extent fallback geometry guards used by the memory encoder."""
    rng = np.random.default_rng(7)
    for C, O, H, W in [(1, 4, 64, 64), (4, 16, 32, 64), (16, 8, 16, 32)]:
        p = layers.conv2d_init(jax.random.PRNGKey(C), C, O, (3, 3))
        x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
        a = layers.conv2d_apply(p, x, stride=(2, 2), explicit_padding=(1, 1))
        for fold in (0, 4, 8, 16):
            if fold and W % fold:
                continue
            b = layers.conv3s2_wfold(p, x, fold=fold)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("bwd", ["xla", "pallas"])
def test_flash_attention_grads_match_xla(rng, monkeypatch, bwd):
    """Custom-VJP backward (XLA kv-chunked recompute AND the two-pass Pallas
    kernels, forced via MEDSAM2_FLASH_BWD) vs autodiff through the XLA SDPA,
    fp32 (tight) and bf16 (loose — bf16 dots with fp32 accumulation)."""
    from medsam2_tpu.ops import attention as attn_mod
    import functools
    from jax.experimental import pallas as pl

    monkeypatch.setenv("MEDSAM2_FLASH_BWD", bwd)
    q0 = rng.standard_normal((1, 2, 128, 64)).astype(np.float32)
    k0 = rng.standard_normal((1, 2, 256, 64)).astype(np.float32)
    v0 = rng.standard_normal((1, 2, 256, 64)).astype(np.float32)
    mask = jnp.asarray(rng.random(256) > 0.3)[None, :]
    w = jnp.asarray(rng.standard_normal((1, 2, 128, 64)).astype(np.float32))

    def run(dtype, tol):
        q, k, v = (jnp.asarray(a, dtype) for a in (q0, k0, v0))

        def loss_flash(q, k, v):
            out = attn_mod.flash_attention(q, k, v, kv_mask=mask,
                                           block_q=64, block_k=128)
            return jnp.sum(out.astype(jnp.float32) * w)

        def loss_xla(q, k, v):
            out = attn_mod.sdpa_xla(q, k, v, kv_mask=mask)
            return jnp.sum(out.astype(jnp.float32) * w)

        orig = pl.pallas_call
        with jax.disable_jit():
            try:
                pl.pallas_call = functools.partial(orig, interpret=True)
                g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
            finally:
                pl.pallas_call = orig
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for gf, gx, name in zip(g_flash, g_xla, "qkv"):
            gf = np.asarray(gf, np.float32)
            gx = np.asarray(gx, np.float32)
            scale = max(np.abs(gx).max(), 1e-3)
            assert np.abs(gf - gx).max() / scale < tol, (
                f"{dtype} grad d{name}: {np.abs(gf - gx).max() / scale:.2e}")

    run(jnp.float32, 5e-5)
    run(jnp.bfloat16, 4e-2)

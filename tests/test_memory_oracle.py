"""Torch-oracle parity for the memory encoder and a full memory-attention layer
(norm placement, RoPE application, kv projection from mem_dim)."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import MemoryAttentionConfig, MemoryEncoderConfig
from medsam2_tpu.core import memory as jmem


def t(a):
    return torch.from_numpy(np.asarray(a).copy())


def ln2d(x, scale, bias, eps=1e-6):
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + eps)
    return scale[:, None, None] * x + bias[:, None, None]


def test_memory_encoder_matches_torch_oracle(rng):
    cfg = MemoryEncoderConfig(out_dim=8, in_dim=16, fuser_num_layers=1)
    params = jmem.memory_encoder_init(jax.random.PRNGKey(0), cfg)
    pix = rng.standard_normal((1, 4, 4, 16)).astype(np.float32)
    masks = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)

    got, pos = jmem.memory_encoder_apply(params, cfg, jnp.asarray(pix),
                                         jnp.asarray(masks))

    with torch.no_grad():
        x = t(masks).permute(0, 3, 1, 2)
        for lp in params["mask_downsampler"]:
            x = F.conv2d(x, t(lp["conv"]["w"]).permute(3, 2, 0, 1), t(lp["conv"]["b"]),
                         stride=2, padding=1)
            x = ln2d(x, t(lp["ln"]["scale"]), t(lp["ln"]["bias"]))
            x = F.gelu(x)
        x = F.conv2d(x, t(params["mask_out_proj"]["w"]).permute(3, 2, 0, 1),
                     t(params["mask_out_proj"]["b"]))
        f = F.conv2d(t(pix).permute(0, 3, 1, 2),
                     t(params["pix_feat_proj"]["w"]).permute(3, 2, 0, 1),
                     t(params["pix_feat_proj"]["b"]))
        f = f + x
        for fp in params["fuser"]:
            inp = f
            f = F.conv2d(f, t(fp["dwconv"]["w"]).permute(3, 2, 0, 1),
                         t(fp["dwconv"]["b"]), padding=3, groups=f.shape[1])
            f = ln2d(f, t(fp["norm"]["scale"]), t(fp["norm"]["bias"]))
            f = f.permute(0, 2, 3, 1)
            f = f @ t(fp["pwconv1"]["w"]) + t(fp["pwconv1"]["b"])
            f = F.gelu(f)
            f = f @ t(fp["pwconv2"]["w"]) + t(fp["pwconv2"]["b"])
            f = t(fp["gamma"]) * f
            f = inp + f.permute(0, 3, 1, 2)
        f = F.conv2d(f, t(params["out_proj"]["w"]).permute(3, 2, 0, 1),
                     t(params["out_proj"]["b"]))
    want = f.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def torch_axial_cis(dim, ex, ey, theta=10000.0):
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 4)[: dim // 4].float() / dim))
    tt = torch.arange(ex * ey, dtype=torch.float32)
    tx, ty = tt % ex, torch.div(tt, ex, rounding_mode="floor").float()
    fx, fy = torch.outer(tx, freqs), torch.outer(ty, freqs)
    return torch.cat([torch.polar(torch.ones_like(fx), fx),
                      torch.polar(torch.ones_like(fy), fy)], -1)


def torch_rope_attn(p, q, k, v, heads, ex, ey, repeat_k, n_exclude):
    """Oracle for RoPEAttention.forward (transformer.py:288-331)."""
    def lin(name, x):
        return x @ t(p[name]["w"]) + t(p[name]["b"])

    def sh(x):
        b, n, c = x.shape
        return x.reshape(b, n, heads, c // heads).transpose(1, 2)

    q = sh(lin("q_proj", q))
    k = sh(lin("k_proj", k))
    v = sh(lin("v_proj", v))
    cis = torch_axial_cis(q.shape[-1], ex, ey)

    def rot(x, cis_):
        xc = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
        return torch.view_as_real(xc * cis_.view(1, 1, *cis_.shape)).flatten(3)

    nk = k.shape[-2] - n_exclude
    cis_k = cis.repeat(nk // q.shape[-2], 1) if repeat_k else cis
    q = rot(q, cis)
    k = torch.cat([rot(k[:, :, :nk], cis_k), k[:, :, nk:]], dim=2)
    out = F.scaled_dot_product_attention(q, k, v)
    b, h, n, d = out.shape
    return lin("out_proj", out.transpose(1, 2).reshape(b, n, h * d))


def test_memory_attention_layer_matches_torch_oracle(rng):
    cfg = MemoryAttentionConfig(d_model=32, num_layers=1, dim_feedforward=64,
                                kv_in_dim=8, dropout=0.0)
    params = jmem.memory_attention_init(jax.random.PRNGKey(1), cfg)
    ex = ey = 4
    N = ex * ey
    n_frames, n_ptr = 2, 4
    curr = rng.standard_normal((1, N, 32)).astype(np.float32)
    curr_pos = rng.standard_normal((1, N, 32)).astype(np.float32)
    mem = rng.standard_normal((1, n_frames * N + n_ptr, 8)).astype(np.float32)
    mem_pos = rng.standard_normal((1, n_frames * N + n_ptr, 8)).astype(np.float32)

    got = jmem.memory_attention_apply(
        params, cfg, jnp.asarray(curr), jnp.asarray(mem), jnp.asarray(curr_pos),
        jnp.asarray(mem_pos), q_hw=(ex, ey), num_obj_ptr_tokens=n_ptr)

    with torch.no_grad():
        lp = params["layers"][0]
        out = t(curr) + 0.1 * t(curr_pos)  # pos_enc_at_input
        # self-attn (pre-norm, pos_enc_at_attn=False)
        def norm(x, np_):
            return F.layer_norm(x, (32,), t(np_["scale"]), t(np_["bias"]))
        tgt2 = norm(out, lp["norm1"])
        sa = torch_rope_attn(lp["self_attn"], tgt2, tgt2, tgt2, 1, ex, ey, False, 0)
        out = out + sa
        # cross-attn: keys get pos enc, queries don't
        tgt2 = norm(out, lp["norm2"])
        kmem = t(mem) + t(mem_pos)
        ca = torch_rope_attn(lp["cross_attn_image"], tgt2, kmem, t(mem), 1,
                             ex, ey, True, n_ptr)
        out = out + ca
        # FFN (relu)
        tgt2 = norm(out, lp["norm3"])
        ff = F.relu(tgt2 @ t(lp["linear1"]["w"]) + t(lp["linear1"]["b"]))
        ff = ff @ t(lp["linear2"]["w"]) + t(lp["linear2"]["b"])
        out = out + ff
        want = F.layer_norm(out, (32,), t(params["norm"]["scale"]),
                            t(params["norm"]["bias"])).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

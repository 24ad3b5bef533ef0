"""Parity test: Hiera trunk + FPN neck vs a torch oracle.

The oracle below re-implements the reference semantics (hieradet.py /
image_encoder.py) in torch from the documented behaviour; weights are shared
with our JAX params through the same layout mapping the checkpoint converter
uses, so this test also pins the converter's transpose conventions.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import HieraConfig, FpnNeckConfig, SAM2Config
from medsam2_tpu.core import hiera as jhiera
from medsam2_tpu.core import image_encoder as jenc


TINY = HieraConfig(
    embed_dim=8,
    num_heads=1,
    stages=(1, 1, 1, 1),
    q_pool=2,
    window_spec=(2, 2, 2, 2),
    global_att_blocks=(2,),
    window_pos_embed_bkg_spatial_size=(3, 3),
)
TINY_NECK = FpnNeckConfig(backbone_channel_list=(64, 32, 16, 8), num_pos_feats=256)


def torch_window_partition(x, ws):
    B, H, W, C = x.shape
    ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp)


def torch_window_unpartition(win, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // ws // ws)
    x = win.view(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W, :]


class OracleBlock(nn.Module):
    def __init__(self, spec, mlp_ratio=4.0):
        super().__init__()
        dim, dim_out, heads = spec["dim"], spec["dim_out"], spec["num_heads"]
        self.spec = spec
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, dim_out * 3)
        self.attn_proj = nn.Linear(dim_out, dim_out)
        self.norm2 = nn.LayerNorm(dim_out, eps=1e-6)
        self.mlp1 = nn.Linear(dim_out, int(dim_out * mlp_ratio))
        self.mlp2 = nn.Linear(int(dim_out * mlp_ratio), dim_out)
        self.proj = nn.Linear(dim, dim_out) if dim != dim_out else None
        self.pool = (
            nn.MaxPool2d(spec["q_stride"], spec["q_stride"]) if spec["q_stride"] else None
        )

    def attn(self, x):
        B, H, W, _ = x.shape
        heads = self.spec["num_heads"]
        dim_out = self.spec["dim_out"]
        qkv = self.qkv(x).reshape(B, H * W, 3, heads, -1)
        q, k, v = torch.unbind(qkv, 2)
        if self.pool is not None:
            q = q.reshape(B, H, W, -1).permute(0, 3, 1, 2)
            q = self.pool(q).permute(0, 2, 3, 1)
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, heads, -1)
        x = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        ).transpose(1, 2).reshape(B, H, W, -1)
        return self.attn_proj(x)

    def forward(self, x):
        spec = self.spec
        shortcut = x
        x = self.norm1(x)
        if self.proj is not None:
            shortcut = self.proj(x)
            if self.pool is not None:
                shortcut = self.pool(shortcut.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        ws = spec["window_size"]
        H, W = x.shape[1], x.shape[2]
        pad_hw = (H, W)
        if ws > 0:
            x, pad_hw = torch_window_partition(x, ws)
        x = self.attn(x)
        out_ws = ws
        if spec["q_stride"] is not None:
            out_ws = ws // spec["q_stride"][0]
            H, W = shortcut.shape[1:3]
            if out_ws > 0:
                ph = (out_ws - H % out_ws) % out_ws
                pw = (out_ws - W % out_ws) % out_ws
                pad_hw = (H + ph, W + pw)
        else:
            H, W = shortcut.shape[1:3]
        if ws > 0:
            x = torch_window_unpartition(x, out_ws, pad_hw, (H, W))
        x = shortcut + x
        h = self.norm2(x)
        x = x + self.mlp2(F.gelu(self.mlp1(h)))
        return x


class OracleHiera(nn.Module):
    def __init__(self, cfg: HieraConfig):
        super().__init__()
        self.cfg = cfg
        self.patch = nn.Conv2d(3, cfg.embed_dim, cfg.patch_kernel, cfg.patch_stride,
                               cfg.patch_padding)
        self.pos_embed = nn.Parameter(
            torch.zeros(1, cfg.embed_dim, *cfg.window_pos_embed_bkg_spatial_size))
        self.pos_embed_window = nn.Parameter(
            torch.zeros(1, cfg.embed_dim, cfg.window_spec[0], cfg.window_spec[0]))
        self.blocks = nn.ModuleList([OracleBlock(s, cfg.mlp_ratio)
                                     for s in cfg.block_schedule()])

    def forward(self, x):
        x = self.patch(x).permute(0, 2, 3, 1)
        h, w = x.shape[1:3]
        pe = F.interpolate(self.pos_embed, size=(h, w), mode="bicubic")
        pe = pe + self.pos_embed_window.tile(
            [a // b for a, b in zip(pe.shape, self.pos_embed_window.shape)])
        x = x + pe.permute(0, 2, 3, 1)
        outs = []
        ends = set(self.cfg.stage_ends)
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in ends:
                outs.append(x)
        return outs


def params_to_oracle(params, oracle: OracleHiera):
    """Copy our JAX params into the torch oracle (inverse of the converter)."""
    def t(a):
        return torch.from_numpy(np.asarray(a))

    oracle.patch.weight.data = t(params["patch_embed"]["proj"]["w"]).permute(3, 2, 0, 1)
    oracle.patch.bias.data = t(params["patch_embed"]["proj"]["b"])
    oracle.pos_embed.data = t(params["pos_embed"]).permute(2, 0, 1)[None]
    oracle.pos_embed_window.data = t(params["pos_embed_window"]).permute(2, 0, 1)[None]
    for bp, ob in zip(params["blocks"], oracle.blocks):
        ob.norm1.weight.data = t(bp["norm1"]["scale"])
        ob.norm1.bias.data = t(bp["norm1"]["bias"])
        ob.qkv.weight.data = t(bp["attn"]["qkv"]["w"]).T
        ob.qkv.bias.data = t(bp["attn"]["qkv"]["b"])
        ob.attn_proj.weight.data = t(bp["attn"]["proj"]["w"]).T
        ob.attn_proj.bias.data = t(bp["attn"]["proj"]["b"])
        ob.norm2.weight.data = t(bp["norm2"]["scale"])
        ob.norm2.bias.data = t(bp["norm2"]["bias"])
        ob.mlp1.weight.data = t(bp["mlp"]["layers"][0]["w"]).T
        ob.mlp1.bias.data = t(bp["mlp"]["layers"][0]["b"])
        ob.mlp2.weight.data = t(bp["mlp"]["layers"][1]["w"]).T
        ob.mlp2.bias.data = t(bp["mlp"]["layers"][1]["b"])
        if ob.proj is not None:
            ob.proj.weight.data = t(bp["proj"]["w"]).T
            ob.proj.bias.data = t(bp["proj"]["b"])


def test_hiera_matches_oracle(rng):
    key = jax.random.PRNGKey(1)
    params = jhiera.hiera_init(key, TINY)
    # non-zero pos embeds already from trunc_normal init
    oracle = OracleHiera(TINY).eval()
    params_to_oracle(params, oracle)

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    outs = jhiera.hiera_apply(params, TINY, jnp.asarray(x))
    with torch.no_grad():
        want = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(outs) == len(want) == 4
    dims = [o.shape[-1] for o in outs]
    assert dims == [8, 16, 32, 64]
    for got, w in zip(outs, want):
        np.testing.assert_allclose(np.asarray(got), w.numpy(), atol=2e-4)


def test_hiera_channel_list_matches_presets():
    from medsam2_tpu.configs import sam2_hiera_t, sam2_hiera_s
    for f in (sam2_hiera_t, sam2_hiera_s):
        cfg = f()
        assert cfg.trunk.channel_list == (768, 384, 192, 96)
        assert tuple(cfg.neck.backbone_channel_list) == cfg.trunk.channel_list


def test_fpn_neck_topdown(rng):
    key = jax.random.PRNGKey(2)
    np_ = jenc.fpn_neck_init(key, TINY_NECK)
    xs = [jnp.asarray(rng.standard_normal((1, 8 // (2 ** i), 8 // (2 ** i), c)).astype(np.float32))
          for i, c in enumerate([8, 16, 32, 64])]
    feats, pos = jenc.fpn_neck_apply(np_, TINY_NECK, xs)
    assert [f.shape[-1] for f in feats] == [256] * 4
    # level 3 = lateral only; level 2 = lateral + nearest-up(level3)
    import medsam2_tpu.core.layers as L
    lat3 = L.conv2d_apply(np_["convs"][0], xs[3], explicit_padding=(0, 0))
    np.testing.assert_allclose(np.asarray(feats[3]), np.asarray(lat3), atol=1e-6)
    lat2 = L.conv2d_apply(np_["convs"][1], xs[2], explicit_padding=(0, 0))
    up = L.interpolate(lat3, (2, 2), method="nearest")
    np.testing.assert_allclose(np.asarray(feats[2]), np.asarray(lat2 + up), atol=1e-6)
    # pos enc shapes follow features
    assert pos[0].shape == feats[0].shape


def test_image_encoder_output_shapes():
    cfg = SAM2Config(
        trunk=TINY, neck=TINY_NECK, image_size=32, scalp=1,
    )
    key = jax.random.PRNGKey(3)
    params = jenc.image_encoder_init(key, cfg)
    x = jnp.zeros((1, 32, 32, 3))
    out = jenc.image_encoder_apply(params, cfg, x)
    assert len(out["backbone_fpn"]) == 3  # scalp drops lowest-res level
    assert out["vision_features"].shape == (1, 2, 2, 256)
    assert out["backbone_fpn"][0].shape == (1, 8, 8, 256)



def test_chain_windows_and_split_qkv_match_base(rng, monkeypatch):
    """The chained-window layout (MEDSAM2_CHAIN_WINDOWS) and the split-qkv
    projection (MEDSAM2_SPLIT_QKV) are pure lowering changes — outputs must
    match the unchained/fused path exactly, both at a window-divisible extent
    (chain engages through every stage) and at a non-divisible one (chain
    must fall back to per-block partition)."""
    for cfg, size in ((TINY, 32),      # 8x8 extent, ws=2: fully chainable
                      (TINY, 40),      # 10x10 extent: 10 % 2 == 0 but pooled
                                       # stages hit 5x5 -> fallback mid-chain
                      (HieraConfig(embed_dim=8, num_heads=2,
                                   stages=(1, 2, 2, 2), q_pool=2,
                                   window_spec=(4, 4, 4, 4),
                                   global_att_blocks=(6,),
                                   window_pos_embed_bkg_spatial_size=(3, 3)),
                       48)):
        params = jhiera.hiera_init(jax.random.PRNGKey(5), cfg)
        x = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
        monkeypatch.setenv("MEDSAM2_CHAIN_WINDOWS", "0")
        monkeypatch.setenv("MEDSAM2_SPLIT_QKV", "0")
        base = jhiera.hiera_apply(params, cfg, x)
        for chain, split in (("1", "0"), ("0", "1"), ("1", "1")):
            monkeypatch.setenv("MEDSAM2_CHAIN_WINDOWS", chain)
            monkeypatch.setenv("MEDSAM2_SPLIT_QKV", split)
            alt = jhiera.hiera_apply(params, cfg, x)
            for b, a in zip(base, alt):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), atol=1e-6, rtol=1e-6,
                    err_msg=f"chain={chain} split={split} size={size}")


def test_dot6d_window_lowering_matches_partition(rng, monkeypatch):
    """The no-partition dot_general window-attention lowering is
    math-identical to the classic partition/SDPA path (same qkv linear, fp32
    softmax) — fp32 exact to tight tolerance, incl. non-divisible H/W
    padding and multi-head blocks."""
    # second config: plain windowed (dot6d-eligible) blocks in stages 2/3 too,
    # multi-head, and a ws=4 block at H=3 so the pad-and-slice path runs
    for cfg, size in ((TINY, 40),
                      (HieraConfig(embed_dim=8, num_heads=2,
                                   stages=(1, 2, 2, 2), q_pool=2,
                                   window_spec=(4, 4, 4, 4),
                                   global_att_blocks=(6,),
                                   window_pos_embed_bkg_spatial_size=(3, 3)),
                       48)):
        params = jhiera.hiera_init(jax.random.PRNGKey(3), cfg)
        x = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
        monkeypatch.delenv("MEDSAM2_WINDOW_LOWERING", raising=False)
        ref = jhiera.hiera_apply(params, cfg, x)
        monkeypatch.setenv("MEDSAM2_WINDOW_LOWERING", "dot6d")
        alt = jhiera.hiera_apply(params, cfg, x)
        monkeypatch.delenv("MEDSAM2_WINDOW_LOWERING", raising=False)
        for r, a in zip(ref, alt):
            np.testing.assert_allclose(np.asarray(r), np.asarray(a),
                                       atol=2e-5, rtol=2e-5)

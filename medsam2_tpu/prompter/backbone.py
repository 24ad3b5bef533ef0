"""Prompter backbone zoo (replaces the reference's vendored 50.8k-LoC timm tree,
which is consumed only through ``timm.create_model`` for feature extraction —
``dpa_p2pnet.py:22-24``; its optim/scheduler subtrees are dead code).

Provides a functional ResNet with GroupNorm (BatchNorm's running statistics are
hostile to pure-functional TPU training; GN is the standard drop-in) returning
4-stage feature pyramids (strides 4/8/16/32), matching the timm
``features_only`` contract the reference relies on.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from medsam2_tpu.core import layers


RESNET_SPECS = {
    "resnet18": ((2, 2, 2, 2), (64, 128, 256, 512), False),
    "resnet34": ((3, 4, 6, 3), (64, 128, 256, 512), False),
    "resnet50": ((3, 4, 6, 3), (256, 512, 1024, 2048), True),
}


def group_norm_init(dim):
    return layers.layer_norm_init(dim)


def group_norm_apply(p, x, groups: int = 32, eps: float = 1e-5):
    B, H, W, C = x.shape
    g = min(groups, C)
    while C % g:
        g -= 1
    xf = x.astype(jnp.float32).reshape(B, H, W, g, C // g)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _block_init(key, in_ch, out_ch, bottleneck: bool, stride: int):
    ks = jax.random.split(key, 4)
    if bottleneck:
        mid = out_ch // 4
        p = {
            "conv1": layers.conv2d_init(ks[0], in_ch, mid, (1, 1), bias=False),
            "gn1": group_norm_init(mid),
            "conv2": layers.conv2d_init(ks[1], mid, mid, (3, 3), bias=False),
            "gn2": group_norm_init(mid),
            "conv3": layers.conv2d_init(ks[2], mid, out_ch, (1, 1), bias=False),
            "gn3": group_norm_init(out_ch),
        }
    else:
        p = {
            "conv1": layers.conv2d_init(ks[0], in_ch, out_ch, (3, 3), bias=False),
            "gn1": group_norm_init(out_ch),
            "conv2": layers.conv2d_init(ks[1], out_ch, out_ch, (3, 3), bias=False),
            "gn2": group_norm_init(out_ch),
        }
    if stride != 1 or in_ch != out_ch:
        p["downsample"] = {
            "conv": layers.conv2d_init(ks[3], in_ch, out_ch, (1, 1), bias=False),
            "gn": group_norm_init(out_ch),
        }
    return p


def _block_apply(p, x, bottleneck: bool, stride: int):
    identity = x
    if bottleneck:
        y = group_norm_apply(p["gn1"], layers.conv2d_apply(p["conv1"], x, explicit_padding=(0, 0)))
        y = jax.nn.relu(y)
        y = group_norm_apply(p["gn2"], layers.conv2d_apply(
            p["conv2"], y, stride=(stride, stride), explicit_padding=(1, 1)))
        y = jax.nn.relu(y)
        y = group_norm_apply(p["gn3"], layers.conv2d_apply(p["conv3"], y, explicit_padding=(0, 0)))
    else:
        y = group_norm_apply(p["gn1"], layers.conv2d_apply(
            p["conv1"], x, stride=(stride, stride), explicit_padding=(1, 1)))
        y = jax.nn.relu(y)
        y = group_norm_apply(p["gn2"], layers.conv2d_apply(p["conv2"], y, explicit_padding=(1, 1)))
    if "downsample" in p:
        identity = group_norm_apply(p["downsample"]["gn"], layers.conv2d_apply(
            p["downsample"]["conv"], x, stride=(stride, stride), explicit_padding=(0, 0)))
    return jax.nn.relu(y + identity)


def resnet_init(key, name: str = "resnet50"):
    depths, dims, bottleneck = RESNET_SPECS[name]
    keys = jax.random.split(key, 2 + sum(depths))
    params = {
        "stem": {
            "conv": layers.conv2d_init(keys[0], 3, 64, (7, 7), bias=False),
            "gn": group_norm_init(64),
        },
        "stages": [],
    }
    ki = 1
    in_ch = 64
    for s, (depth, out_ch) in enumerate(zip(depths, dims)):
        stage = []
        for b in range(depth):
            stride = 2 if (b == 0 and s > 0) else 1
            stage.append(_block_init(keys[ki], in_ch, out_ch, bottleneck, stride))
            in_ch = out_ch
            ki += 1
        params["stages"].append(stage)
    return params


def resnet_apply(params, x, name: str = "resnet50") -> List[jnp.ndarray]:
    """x: [B, H, W, 3] -> 4 feature maps at strides 4/8/16/32 (NHWC)."""
    depths, dims, bottleneck = RESNET_SPECS[name]
    y = layers.conv2d_apply(params["stem"]["conv"], x, stride=(2, 2), explicit_padding=(3, 3))
    y = jax.nn.relu(group_norm_apply(params["stem"]["gn"], y))
    y = layers.max_pool2d(jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                  constant_values=-jnp.inf), (3, 3), (2, 2))
    outs = []
    for s, stage in enumerate(params["stages"]):
        for b, bp in enumerate(stage):
            stride = 2 if (b == 0 and s > 0) else 1
            y = _block_apply(bp, y, bottleneck, stride)
        outs.append(y)
    return outs


# ---------------------------------------------------------------------------
# PVT-v2 (the DPA-P2PNet paper default; reference consumes it via
# ``timm.create_model`` — ``dpa_p2pnet.py:22-24``, timm ``models/pvt_v2.py``)
# ---------------------------------------------------------------------------

# depths, embed_dims, num_heads, mlp_ratios, sr_ratios
PVT_SPECS = {
    "pvt_v2_b0": ((2, 2, 2, 2), (32, 64, 160, 256), (1, 2, 5, 8),
                  (8, 8, 4, 4), (8, 4, 2, 1)),
    "pvt_v2_b2": ((3, 4, 6, 3), (64, 128, 320, 512), (1, 2, 5, 8),
                  (8, 8, 4, 4), (8, 4, 2, 1)),
}


def _pvt_block_init(key, dim: int, mlp_ratio: int, sr: int):
    ks = jax.random.split(key, 8)
    hidden = dim * mlp_ratio
    p = {
        "norm1": layers.layer_norm_init(dim),
        "q": layers.linear_init(ks[0], dim, dim),
        "kv": layers.linear_init(ks[1], dim, 2 * dim),
        "proj": layers.linear_init(ks[2], dim, dim),
        "norm2": layers.layer_norm_init(dim),
        "fc1": layers.linear_init(ks[3], dim, hidden),
        "dwconv": layers.conv2d_init(ks[4], hidden, hidden, (3, 3), groups=hidden),
        "fc2": layers.linear_init(ks[5], hidden, dim),
    }
    if sr > 1:
        p["sr"] = layers.conv2d_init(ks[6], dim, dim, (sr, sr))
        p["sr_norm"] = layers.layer_norm_init(dim)
    return p


def _pvt_block_apply(bp, x, num_heads: int, sr: int):
    """PVTv2 Block on an NHWC map: SRA attention + MixFFN (depthwise-conv MLP)
    (timm ``pvt_v2.py:83-185``)."""
    from medsam2_tpu.ops.attention import attention

    B, H, W, C = x.shape
    n = layers.layer_norm_apply(bp["norm1"], x, eps=1e-6).reshape(B, H * W, C)
    q = layers.linear_apply(bp["q"], n)
    if sr > 1:
        # spatial-reduction conv k=sr/s=sr (no padding) + LN (default eps)
        xr = layers.conv2d_apply(bp["sr"], n.reshape(B, H, W, C),
                                 stride=(sr, sr), explicit_padding=(0, 0))
        kv_src = layers.layer_norm_apply(
            bp["sr_norm"], xr.reshape(B, -1, C), eps=1e-5)
    else:
        kv_src = n
    kv = layers.linear_apply(bp["kv"], kv_src)
    k, v = kv[..., :C], kv[..., C:]
    hd = C // num_heads

    def heads(t):
        return t.reshape(B, -1, num_heads, hd).transpose(0, 2, 1, 3)

    out = attention(heads(q), heads(k), heads(v))
    out = out.transpose(0, 2, 1, 3).reshape(B, H * W, C)
    x = x + layers.linear_apply(bp["proj"], out).reshape(B, H, W, C)

    n2 = layers.layer_norm_apply(bp["norm2"], x, eps=1e-6)
    h = layers.linear_apply(bp["fc1"], n2)
    h = layers.conv2d_apply(bp["dwconv"], h, explicit_padding=(1, 1),
                            groups=h.shape[-1])
    h = layers.gelu(h)
    return x + layers.linear_apply(bp["fc2"], h)


def pvt_init(key, name: str = "pvt_v2_b0"):
    depths, dims, heads, mlps, srs = PVT_SPECS[name]
    keys = jax.random.split(key, 2 * len(depths) + sum(depths))
    stages = []
    ki = 0
    in_ch = 3
    for s in range(len(depths)):
        patch = 7 if s == 0 else 3
        stage = {
            "patch_embed": layers.conv2d_init(keys[ki], in_ch, dims[s],
                                              (patch, patch)),
            "embed_norm": layers.layer_norm_init(dims[s]),
            "blocks": [],
            "norm": layers.layer_norm_init(dims[s]),
        }
        ki += 2
        for _ in range(depths[s]):
            stage["blocks"].append(
                _pvt_block_init(keys[ki], dims[s], mlps[s], srs[s]))
            ki += 1
        stages.append(stage)
        in_ch = dims[s]
    return {"stages": stages}


def pvt_apply(params, x, name: str = "pvt_v2_b0") -> List[jnp.ndarray]:
    """x: [B, H, W, 3] -> 4 NHWC feature maps at strides 4/8/16/32
    (timm ``features_only`` contract)."""
    depths, dims, heads, mlps, srs = PVT_SPECS[name]
    outs = []
    for s, stage in enumerate(params["stages"]):
        stride, patch = (4, 7) if s == 0 else (2, 3)
        x = layers.conv2d_apply(stage["patch_embed"], x, stride=(stride, stride),
                                explicit_padding=(patch // 2, patch // 2))
        # OverlapPatchEmbed norm: default-eps LN (pvt_v2.py:187-206)
        x = layers.layer_norm_apply(stage["embed_norm"], x, eps=1e-5)
        for bp in stage["blocks"]:
            x = _pvt_block_apply(bp, x, heads[s], srs[s])
        x = layers.layer_norm_apply(stage["norm"], x, eps=1e-6)
        outs.append(x)
    return outs


# ---------------------------------------------------------------------------
# generic dispatch (the ``backbone_channels`` interface the prompter uses)
# ---------------------------------------------------------------------------


def backbone_init(key, name: str):
    return pvt_init(key, name) if name in PVT_SPECS else resnet_init(key, name)


def backbone_apply(params, x, name: str) -> List[jnp.ndarray]:
    return pvt_apply(params, x, name) if name in PVT_SPECS else \
        resnet_apply(params, x, name)


def backbone_channels(name: str) -> Tuple[int, ...]:
    if name in PVT_SPECS:
        return PVT_SPECS[name][1]
    return RESNET_SPECS[name][1]

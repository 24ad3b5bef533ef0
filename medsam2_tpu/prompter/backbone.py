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


def backbone_channels(name: str) -> Tuple[int, ...]:
    return RESNET_SPECS[name][1]

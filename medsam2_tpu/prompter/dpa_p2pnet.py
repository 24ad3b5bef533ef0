"""DPA-P2PNet point-detection prompter (rebuild of
``sam2_train/modeling/dpa_p2pnet.py``).

Pipeline: backbone -> two FPNs (multi-level + single-level for the mask head)
-> optional SR_PFO SAM-feature injection -> anchor grid every ``space`` px ->
deformable point proposals (bilinear feature sampling at anchors -> offset MLP)
-> multi-scale decoding (sample all levels at deformed points, concat, 3x3
conv) -> coordinate-refinement and classification heads + semantic mask head.

The CUDA ``grid_sample`` is replaced by a vectorized bilinear gather
(align_corners=True convention, matching ``F.grid_sample`` at
``dpa_p2pnet.py:387,395``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.core import layers
from medsam2_tpu.prompter import backbone as bb
from medsam2_tpu.prompter.fpn import fpn_apply, fpn_init


@dataclasses.dataclass(frozen=True)
class PrompterConfig:
    backbone: str = "resnet50"
    num_levels: int = 4
    num_classes: int = 1
    hidden_dim: int = 256
    space: int = 16
    dropout: float = 0.1  # head MLP dropout (dpa_p2pnet.py:65-75); active
                          # only when prompter_apply gets a dropout_key
    use_sr_pfo: bool = True

    @property
    def strides(self) -> Tuple[int, ...]:
        return tuple(2 ** (i + 2) for i in range(self.num_levels))


def grid_sample_points(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling of NHWC ``feat`` [B, H, W, C] at normalized coords
    [B, N, 2] in [-1, 1] (x, y), align_corners=True. Returns [B, N, C]."""
    B, H, W, C = feat.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    def gather(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        flat = feat.reshape(B, H * W, C)
        return jnp.take_along_axis(flat, (yi * W + xi)[..., None], axis=1)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    tx = tx[..., None]
    ty = ty[..., None]
    return ((1 - ty) * ((1 - tx) * v00 + tx * v01)
            + ty * ((1 - tx) * v10 + tx * v11))


def anchor_points(h: int, w: int, space: int) -> np.ndarray:
    """Anchor grid every ``space`` px (``dpa_p2pnet.py:43-60``). [N, 2] (x, y)."""
    ax = np.arange(np.ceil(w / space)) * space
    ay = np.arange(np.ceil(h / space)) * space
    anchors = np.stack(np.meshgrid(ax, ay), -1).astype(np.float32)
    origin = np.array([w % space or space, h % space or space], np.float32) / 2
    return (anchors + origin).reshape(-1, 2)


def _head_mlp_init(key, in_dim, hidden, out_dim):
    # MLP(input, hidden, 2 layers, out) of the reference (dpa_p2pnet.py:63-81):
    # Linear->ReLU->Linear->ReLU->Linear(out)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "l1": layers.linear_init(k1, in_dim, hidden),
        "l2": layers.linear_init(k2, hidden, hidden),
        "out": layers.linear_init(k3, hidden, out_dim),
    }


def _head_mlp_apply(p, x, rate: float = 0.0, key=None):
    """Linear->ReLU[->Dropout]->Linear->ReLU[->Dropout]->Linear; dropout after
    each hidden ReLU matches the reference MLP (dpa_p2pnet.py:65-75) and is
    active only when ``key`` is given (training)."""
    k1 = k2 = None
    if key is not None and rate > 0.0:
        k1, k2 = jax.random.split(key)
    x = _head_dropout(jax.nn.relu(layers.linear_apply(p["l1"], x)), rate, k1)
    x = _head_dropout(jax.nn.relu(layers.linear_apply(p["l2"], x)), rate, k2)
    return layers.linear_apply(p["out"], x)


def _head_dropout(x, rate: float, key):
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def sr_pfo_init(key, dim: int = 256, hidden: int = 512):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "mlp_p": _head_mlp_init(k1, dim, hidden, dim),
        "conv1": layers.conv2d_init(k2, dim, dim, (3, 3)),
        "conv2": layers.conv2d_init(k3, dim, dim, (3, 3)),
        "scale": jnp.ones((1,), jnp.float32),
    }


def sr_pfo_apply(p, feats: List[jnp.ndarray], sam_feature: jnp.ndarray,
                 dropout_rate: float = 0.0, dropout_key=None):
    """SAM-guided point-feature optimization (``dpa_p2pnet.py:161-187``): each
    pyramid level goes through a shared per-pixel MLP and receives the scaled,
    MLP'd, conv-refined SAM semantic feature resized to its resolution."""
    keys = (jax.random.split(dropout_key, len(feats) + 1)
            if dropout_key is not None else [None] * (len(feats) + 1))
    sam = sam_feature * p["scale"].astype(sam_feature.dtype)
    sam = _head_mlp_apply(p["mlp_p"], sam, dropout_rate, keys[0])
    out = []
    for i, f in enumerate(feats):
        fm = _head_mlp_apply(p["mlp_p"], f, dropout_rate, keys[i + 1])
        s = layers.interpolate(sam.astype(jnp.float32), f.shape[1:3],
                               method="bilinear").astype(f.dtype)
        s = layers.conv2d_apply(p["conv1"], s, explicit_padding=(1, 1))
        s = jax.nn.relu(s)
        s = layers.conv2d_apply(p["conv2"], s, explicit_padding=(1, 1))
        out.append(fm + s)
    return out


def prompter_init(key, cfg: PrompterConfig):
    ks = jax.random.split(key, 10)
    chans = bb.backbone_channels(cfg.backbone)
    d = cfg.hidden_dim
    p = {
        "backbone": bb.backbone_init(ks[0], cfg.backbone),
        "neck": fpn_init(ks[1], chans, d),
        "neck1": fpn_init(ks[2], chans, d),
        "deform_layer": _head_mlp_init(ks[3], d, d, 2),
        "reg_head": _head_mlp_init(ks[4], d, d, 2),
        "cls_head": _head_mlp_init(ks[5], d, d, cfg.num_classes + 1),
        "conv": layers.conv2d_init(ks[6], d * cfg.num_levels, d, (3, 3)),
        "mask_head": {
            "conv1": layers.conv2d_init(ks[7], d, d, (3, 3)),
            "gn": bb.group_norm_init(d),
            "conv2": layers.conv2d_init(ks[8], d, 1, (1, 1)),
        },
    }
    if cfg.use_sr_pfo:
        p["sr_pfo"] = sr_pfo_init(ks[9], d)
    return p


def prompter_apply(params, cfg: PrompterConfig, images: jnp.ndarray,
                   semantic_feature: Optional[jnp.ndarray] = None,
                   dropout_key=None):
    """images: [B, H, W, 3]; semantic_feature: optional SAM feature [B, h, w, C].
    ``dropout_key`` activates head-MLP dropout (rate ``cfg.dropout``) for
    training; None = deterministic.

    Returns (outputs dict {pred_coords [B, N, 2], pred_logits [B, N, C+1],
    pred_masks [B, H, W]}, pyramid feats list)."""
    B, H, W, _ = images.shape
    kd = ks = kr = kc = None
    if dropout_key is not None and cfg.dropout > 0.0:
        kd, ks, kr, kc = jax.random.split(dropout_key, 4)
    trunk_feats = bb.backbone_apply(params["backbone"], images, cfg.backbone)
    feats = fpn_apply(params["neck"], trunk_feats, cfg.num_levels)
    feats1 = fpn_apply(params["neck1"], trunk_feats, 1)[0]
    if semantic_feature is not None and "sr_pfo" in params:
        feats = sr_pfo_apply(params["sr_pfo"], feats, semantic_feature,
                             cfg.dropout, ks)

    anchors = jnp.asarray(anchor_points(H, W, cfg.space))  # [N, 2]
    proposals = jnp.broadcast_to(anchors[None], (B, *anchors.shape))

    def normalize(coords, level):
        h, w = feats[level].shape[1:3]
        size = jnp.asarray([w, h], jnp.float32)
        return 2.0 * coords / cfg.strides[level] / size - 1.0

    # DPP: deform proposals from level-0 features
    roi = grid_sample_points(feats[0], normalize(proposals, 0))
    deltas = _head_mlp_apply(params["deform_layer"], roi, cfg.dropout, kd)
    deformed = proposals + deltas.astype(proposals.dtype)

    # MSD: sample every level at the deformed points
    rois = [grid_sample_points(feats[i], normalize(deformed, i))
            for i in range(cfg.num_levels)]
    roi_cat = jnp.concatenate(rois, axis=-1)  # [B, N, L*C]
    # 3x3 conv over the (grid-shaped) proposal lattice, as the reference does
    gh = int(np.ceil(H / cfg.space))
    gw = int(np.ceil(W / cfg.space))
    roi_map = roi_cat.reshape(B, gh, gw, -1)
    roi_map = layers.conv2d_apply(params["conv"], roi_map, explicit_padding=(1, 1))
    roi_feat = roi_map.reshape(B, gh * gw, -1)

    deltas2refine = _head_mlp_apply(params["reg_head"], roi_feat, cfg.dropout, kr)
    pred_coords = deformed + deltas2refine.astype(deformed.dtype)
    pred_logits = _head_mlp_apply(params["cls_head"], roi_feat, cfg.dropout, kc)

    m = layers.conv2d_apply(params["mask_head"]["conv1"], feats1, explicit_padding=(1, 1))
    m = jax.nn.relu(bb.group_norm_apply(params["mask_head"]["gn"], m))
    m = layers.conv2d_apply(params["mask_head"]["conv2"], m, explicit_padding=(0, 0))
    pred_masks = layers.interpolate(m.astype(jnp.float32), (H, W),
                                    method="bilinear")[..., 0]

    outputs = {
        "pred_coords": pred_coords,
        "pred_logits": pred_logits,
        "pred_masks": pred_masks,
    }
    return outputs, feats

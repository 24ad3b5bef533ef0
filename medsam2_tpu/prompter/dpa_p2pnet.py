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
    # mask-head norm: "bn" executes the reference's SyncBatchNorm math
    # (dpa_p2pnet.py:447-452) — batch stats while training (a dropout_key is
    # given; on a mesh this equals SyncBatchNorm when the batch axis is fully
    # on-device), running stats at eval — and is checkpoint-compatible with
    # reference prompter weights. "gn" keeps the stateless GroupNorm variant
    # (no running stats to track; the round-1/2 default).
    mask_norm: str = "bn"

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


def _head_mlp_init(key, in_dim, hidden, out_dim, n_hidden: int = 1):
    """Reference ``MLP(input, hidden, num_layers, out)`` (dpa_p2pnet.py:63-81):
    ``num_layers - 1`` blocks of Linear->ReLU->Dropout, then Linear(out).
    The deform/reg/cls heads use ``num_layers=2`` -> ONE hidden layer
    (``n_hidden=1``); SR_PFO's per-pixel MLP uses ``num_layers=3`` ->
    ``n_hidden=2``."""
    keys = jax.random.split(key, n_hidden + 1)
    p = {"l1": layers.linear_init(keys[0], in_dim, hidden)}
    if n_hidden >= 2:
        p["l2"] = layers.linear_init(keys[1], hidden, hidden)
    p["out"] = layers.linear_init(keys[-1], hidden, out_dim)
    return p


def _head_mlp_apply(p, x, rate: float = 0.0, key=None):
    """(Linear->ReLU[->Dropout]) x n_hidden -> Linear; dropout after each
    hidden ReLU matches the reference MLP (dpa_p2pnet.py:65-75) and is active
    only when ``key`` is given (training)."""
    k1 = k2 = None
    if key is not None and rate > 0.0:
        k1, k2 = jax.random.split(key)
    x = _head_dropout(jax.nn.relu(layers.linear_apply(p["l1"], x)), rate, k1)
    if "l2" in p:
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
        "mlp_p": _head_mlp_init(k1, dim, hidden, dim, n_hidden=2),
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
            "conv2": layers.conv2d_init(ks[8], d, 1, (1, 1)),
        },
    }
    if cfg.mask_norm == "bn":
        # SyncBatchNorm(d) of the reference mask head (dpa_p2pnet.py:447-452):
        # affine weight/bias + running stats (torch init: w=1, b=0, rm=0, rv=1)
        p["mask_head"]["bn"] = {
            "w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32),
            "mean": jnp.zeros((d,), jnp.float32),
            "var": jnp.ones((d,), jnp.float32),
        }
    else:
        p["mask_head"]["gn"] = bb.group_norm_init(d)
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

    mh = params["mask_head"]
    m = layers.conv2d_apply(mh["conv1"], feats1, explicit_padding=(1, 1))
    bn_stats = None
    if "bn" in mh:
        # SyncBatchNorm (dpa_p2pnet.py:449): batch stats while training (a
        # dropout_key marks training), running stats at eval; torch eps=1e-5.
        bn = mh["bn"]
        if dropout_key is not None:
            mf = m.astype(jnp.float32)
            mu = mf.mean(axis=(0, 1, 2))
            var = mf.var(axis=(0, 1, 2))  # biased, as torch normalizes with
            n = mf.shape[0] * mf.shape[1] * mf.shape[2]
            # running-stat update uses the UNBIASED variance (torch semantics);
            # surfaced to the train step, which EMA-updates params["...]["bn"].
            bn_stats = {"mean": mu, "var": var * (n / max(n - 1, 1))}
        else:
            mu, var = bn["mean"], bn["var"]
        scale = (bn["w"] / jnp.sqrt(var + 1e-5)).astype(m.dtype)
        shift = (bn["b"] - mu * bn["w"] / jnp.sqrt(var + 1e-5)).astype(m.dtype)
        m = m * scale + shift
    else:
        m = bb.group_norm_apply(mh["gn"], m)
    m = jax.nn.relu(m)
    # reference final conv: nn.Conv2d(d, 1, kernel_size=1, padding=1)
    # (dpa_p2pnet.py:451) — the k=1 conv pads its INPUT with one zero pixel,
    # so the output is (h+2, w+2) with a bias-valued border that feeds the
    # align_corners=True bilinear upsample below. Reproduced exactly.
    m = layers.conv2d_apply(mh["conv2"], m, explicit_padding=(1, 1))
    pred_masks = layers.bilinear_resize_ac(m.astype(jnp.float32), (H, W))[..., 0]

    outputs = {
        "pred_coords": pred_coords,
        "pred_logits": pred_logits,
        "pred_masks": pred_masks,
    }
    if bn_stats is not None:
        outputs["mask_bn_stats"] = bn_stats
    return outputs, feats

"""Executed-reference differential for the DPA-P2PNet prompter.

Imports and RUNS the reference's own modules — the vendored timm PVT-v2
(``sam2_train/modeling/timm/models/pvt_v2.py``), the mmdet-style FPN
(``sam2_train/modeling/fpn.py``, with minimal mmcv/mmengine stubs: ConvModule
with all cfgs None is a plain biased Conv2d), and the live ``DPAP2PNet``
(``sam2_train/modeling/dpa_p2pnet.py:331`` — the apparent redefinition at
:414 sits inside a dead triple-quoted string, lines 413-504) — with shared
weights, and pins our ``prompter_apply`` to the executed forward: anchor
proposals, DPP deform, MSD multi-level sampling, reg/cls heads (2-linear
MLPs: ``MLP(..., num_layers=2, ...)``), the SR_PFO semantic-refinement path
(whose interpolation targets are hard-coded to the 256-px nuclei feature
sizes 64/32/16/8, dpa_p2pnet.py:171-177), and the mask head (frozen
SyncBatchNorm + the k=1/padding=1 final conv + align_corners=True upsample).

The re-derived oracles in test_prompter.py share any misreading of the
reference; this file executes the reference instead (same approach as
test_reference_differential.py for the SAM2 core).
"""

import importlib
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn

from medsam2_tpu.prompter import backbone as bb
from medsam2_tpu.prompter import dpa_p2pnet as dpa

from tests.test_pvt import (TINY_SPEC, _conv, _convert_pvt, _lin,
                            _load_reference_pvt, _stub)


def _load_reference_fpn():
    class ConvModule(nn.Module):
        # mmcv ConvModule with conv_cfg/norm_cfg/act_cfg all None (the only
        # configuration the reference FPN is built with) is a biased Conv2d
        def __init__(self, in_ch, out_ch, k, stride=1, padding=0,
                     conv_cfg=None, norm_cfg=None, act_cfg=None,
                     inplace=True, **kw):
            super().__init__()
            assert conv_cfg is None and norm_cfg is None and act_cfg is None
            self.conv = nn.Conv2d(in_ch, out_ch, k, stride, padding, bias=True)

        def forward(self, x):
            return self.conv(x)

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    class _Registry:
        def register_module(self, *a, **k):
            return lambda cls: cls

    _stub("mmcv"); _stub("mmcv.cnn", ConvModule=ConvModule)
    _stub("mmengine"); _stub("mmengine.model", BaseModule=BaseModule)
    _stub("mmdet"); _stub("mmdet.registry", MODELS=_Registry())
    _stub("mmdet.utils", ConfigType=object, MultiConfig=object,
          OptConfigType=object)
    return importlib.import_module("sam2_train.modeling.fpn")


def _load_reference_dpa():
    _stub("timm", __file__="<stub>")
    return importlib.import_module("sam2_train.modeling.dpa_p2pnet")


def _convert_fpn(tneck, ours):
    out = dict(ours)
    out["lateral"] = [_conv(l.conv) for l in tneck.lateral_convs]
    fpn = list(ours["fpn"])
    for i, f in enumerate(tneck.fpn_convs):
        fpn[i] = _conv(f.conv)  # neck1 builds only num_outs fpn convs;
    out["fpn"] = fpn            # our extras compute discarded levels
    return out


def _convert_head_mlp(tmlp):
    # reference MLP(num_layers=2): layers = [Linear, ReLU, Dropout, Linear]
    lins = [m for m in tmlp.layers if isinstance(m, nn.Linear)]
    p = {"l1": _lin(lins[0]), "out": _lin(lins[-1])}
    if len(lins) == 3:
        p["l2"] = _lin(lins[1])
    return p


@pytest.fixture(scope="module")
def ref_modules():
    pvt_mod = _load_reference_pvt()
    fpn_mod = _load_reference_fpn()
    dpa_mod = _load_reference_dpa()
    return pvt_mod, fpn_mod, dpa_mod


def test_dpa_p2pnet_matches_executed_reference(ref_modules, rng):
    pvt_mod, fpn_mod, dpa_mod = ref_modules

    torch.manual_seed(0)
    depths, dims, heads, mlps, srs = TINY_SPEC
    d = 32
    tpvt = pvt_mod.PyramidVisionTransformerV2(
        depths=depths, embed_dims=dims, num_heads=heads, mlp_ratios=mlps,
        sr_ratios=srs, num_classes=0,
        norm_layer=lambda c: nn.LayerNorm(c, eps=1e-6)).eval()
    tneck = fpn_mod.FPN(in_channels=list(dims), out_channels=d, num_outs=4)
    tneck1 = fpn_mod.FPN(in_channels=list(dims), out_channels=d, num_outs=1)

    class RefBackbone(nn.Module):
        """Executes Backbone.forward's wiring (dpa_p2pnet.py:38-40) on the
        executed vendored PVT (timm.create_model feature extraction =
        per-stage NCHW pyramid, pinned by test_pvt.py)."""

        def __init__(self):
            super().__init__()
            self.pvt, self.neck, self.neck1 = tpvt, tneck, tneck1

        def forward(self, images):
            x, feat_size = self.pvt.patch_embed(images)
            feats = []
            for tstage in self.pvt.stages:
                x, feat_size = tstage(x, feat_size)
                feats.append(x)
            return list(self.neck(feats)), self.neck1(feats)[0]

    tsr = dpa_mod.SR_PFO(dropout=0.0, input_dim=d, hidden_dim=2 * d,
                         num_layers=3, output_dim=d)
    tmodel = dpa_mod.DPAP2PNet(RefBackbone(), tsr, num_levels=4,
                               num_classes=1, dropout=0.0, space=16,
                               hidden_dim=d).eval()
    # nontrivial frozen-BN stats (fresh init would make BN a near-identity)
    sbn = tmodel.mask_head[1]
    with torch.no_grad():
        sbn.running_mean.copy_(torch.randn(d) * 0.3)
        sbn.running_var.copy_(torch.rand(d) + 0.5)
        sbn.weight.copy_(torch.randn(d) * 0.2 + 1.0)
        sbn.bias.copy_(torch.randn(d) * 0.1)

    # 256 px: the size SR_PFO's hard-coded 64/32/16/8 interpolation targets
    # require (the nuclei workload size) — and a 16x16 anchor grid
    B, S = 2, 256
    x = rng.standard_normal((B, S, S, 3)).astype(np.float32)
    sem = rng.standard_normal((B, 16, 16, d)).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tout_plain = tmodel(tx, None)[0]
        tout_sem = tmodel(tx, torch.from_numpy(sem.transpose(0, 3, 1, 2)))[0]

    cfg = dpa.PrompterConfig(backbone="_tiny", num_classes=1, hidden_dim=d,
                             space=16, dropout=0.0, use_sr_pfo=True,
                             mask_norm="bn")
    bb.PVT_SPECS["_tiny"] = TINY_SPEC
    try:
        params = dpa.prompter_init(jax.random.PRNGKey(0), cfg)
    finally:
        del bb.PVT_SPECS["_tiny"]
    params["backbone"] = _convert_pvt(tpvt, depths)
    params["neck"] = _convert_fpn(tneck, params["neck"])
    params["neck1"] = _convert_fpn(tneck1, params["neck1"])
    params["deform_layer"] = _convert_head_mlp(tmodel.deform_layer)
    params["reg_head"] = _convert_head_mlp(tmodel.reg_head)
    params["cls_head"] = _convert_head_mlp(tmodel.cls_head)
    params["conv"] = _conv(tmodel.conv)
    params["sr_pfo"] = {
        "mlp_p": _convert_head_mlp(tsr.mlp_p),
        "conv1": _conv(tsr.conv[0]),
        "conv2": _conv(tsr.conv[2]),
        "scale": jnp.asarray(tsr.scale.detach().numpy()),
    }
    params["mask_head"] = {
        "conv1": _conv(tmodel.mask_head[0]),
        "bn": {"w": jnp.asarray(sbn.weight.detach().numpy()),
               "b": jnp.asarray(sbn.bias.detach().numpy()),
               "mean": jnp.asarray(sbn.running_mean.numpy()),
               "var": jnp.asarray(sbn.running_var.numpy())},
        "conv2": _conv(tmodel.mask_head[3]),
    }

    bb.PVT_SPECS["_tiny"] = TINY_SPEC
    try:
        out_plain, _ = dpa.prompter_apply(params, cfg, jnp.asarray(x))
        out_sem, _ = dpa.prompter_apply(params, cfg, jnp.asarray(x),
                                        jnp.asarray(sem))
    finally:
        del bb.PVT_SPECS["_tiny"]

    for out, tout in ((out_plain, tout_plain), (out_sem, tout_sem)):
        np.testing.assert_allclose(
            np.asarray(out["pred_coords"]), tout["pred_coords"].numpy(),
            atol=5e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out["pred_logits"]), tout["pred_logits"].numpy(),
            atol=5e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out["pred_masks"]), tout["pred_masks"][:, 0].numpy(),
            atol=5e-4, rtol=1e-4)
    # the semantic path must actually change the predictions
    assert not np.allclose(np.asarray(out_plain["pred_logits"]),
                           np.asarray(out_sem["pred_logits"]))


def test_sr_pfo_matches_executed_reference(ref_modules, rng):
    _, _, dpa_mod = ref_modules
    torch.manual_seed(1)
    d = 16
    tsr = dpa_mod.SR_PFO(dropout=0.0, input_dim=d, hidden_dim=2 * d,
                         num_layers=3, output_dim=d).eval()

    B = 2
    # the reference hard-codes the interpolation targets to the 256-px nuclei
    # pyramid (64/32/16/8, dpa_p2pnet.py:171-177); our rebuild derives them
    # from each level's shape, so the two coincide exactly at these sizes
    sizes = [(64, 64), (32, 32), (16, 16), (8, 8)]
    feats = [rng.standard_normal((B, h, w, d)).astype(np.float32)
             for h, w in sizes]
    feats1 = rng.standard_normal((B, 64, 64, d)).astype(np.float32)
    sam = rng.standard_normal((B, 16, 16, d)).astype(np.float32)

    with torch.no_grad():
        tfeats = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]
        tout, tfeats1 = tsr(tfeats, torch.from_numpy(feats1.transpose(0, 3, 1, 2)),
                            torch.from_numpy(sam.transpose(0, 3, 1, 2)))

    # SR_PFO's per-pixel MLP is MLP(num_layers=3) -> the 3-linear shape
    p = {
        "mlp_p": _convert_head_mlp(tsr.mlp_p),
        "conv1": _conv(tsr.conv[0]),
        "conv2": _conv(tsr.conv[2]),
        "scale": jnp.asarray(tsr.scale.detach().numpy()),
    }
    assert "l2" in p["mlp_p"]
    got = dpa.sr_pfo_apply(p, [jnp.asarray(f) for f in feats], jnp.asarray(sam))
    for g, w in zip(got, tout):
        np.testing.assert_allclose(np.asarray(g),
                                   w.numpy().transpose(0, 2, 3, 1),
                                   atol=5e-4, rtol=1e-4)
    # feats1 passes through unchanged in the live forward (dpa_p2pnet.py:186)
    np.testing.assert_allclose(tfeats1.numpy().transpose(0, 2, 3, 1), feats1)

"""PVT-v2 prompter backbone oracle (VERDICT r1 #8).

Executes the reference's vendored timm PVTv2
(``/root/reference/sam2_train/modeling/timm/models/pvt_v2.py``) with stubbed
timm-internal imports, pushes shared weights into our functional rebuild, and
pins the 4-level feature pyramid. Also checks the prompter accepts the
pvt_v2 backbones end to end."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn

from medsam2_tpu.prompter import backbone as bb

REF_TIMM = "sam2_train.modeling.timm"


def _stub(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _load_reference_pvt():
    import importlib

    def to_2tuple(x):
        return x if isinstance(x, (tuple, list)) else (x, x)

    def to_ntuple(n):
        return lambda x: tuple(x) if isinstance(x, (tuple, list)) else (x,) * n

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    _stub("sam2_train", __path__=["/root/reference/sam2_train"])
    _stub("sam2_train.modeling", __path__=["/root/reference/sam2_train/modeling"])
    _stub(REF_TIMM, __path__=["/root/reference/sam2_train/modeling/timm"])
    _stub(REF_TIMM + ".models",
          __path__=["/root/reference/sam2_train/modeling/timm/models"])
    _stub(REF_TIMM + ".models.helpers", build_model_with_cfg=lambda *a, **k: None)
    _stub(REF_TIMM + ".models.layers", DropPath=DropPath, to_2tuple=to_2tuple,
          to_ntuple=to_ntuple, trunc_normal_=torch.nn.init.trunc_normal_)
    _stub(REF_TIMM + ".models.registry", register_model=lambda f: f)
    _stub("timm")
    _stub("timm.data", IMAGENET_DEFAULT_MEAN=(0.485, 0.456, 0.406),
          IMAGENET_DEFAULT_STD=(0.229, 0.224, 0.225))
    return importlib.import_module(REF_TIMM + ".models.pvt_v2")


TINY_SPEC = ((1, 2, 1, 1), (8, 16, 32, 64), (1, 2, 4, 8), (2, 2, 2, 2),
             (8, 4, 2, 1))


def _lin(t):
    return {"w": jnp.asarray(t.weight.detach().numpy().T),
            "b": jnp.asarray(t.bias.detach().numpy())}


def _conv(t):
    return {"w": jnp.asarray(t.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "b": jnp.asarray(t.bias.detach().numpy())}


def _ln(t):
    return {"scale": jnp.asarray(t.weight.detach().numpy()),
            "bias": jnp.asarray(t.bias.detach().numpy())}


def _convert_pvt(model, depths):
    stages = []
    for s, tstage in enumerate(model.stages):
        embed = model.patch_embed if s == 0 else tstage.downsample
        stage = {
            "patch_embed": _conv(embed.proj),
            "embed_norm": _ln(embed.norm),
            "norm": _ln(tstage.norm),
            "blocks": [],
        }
        for blk in tstage.blocks:
            bp = {
                "norm1": _ln(blk.norm1),
                "q": _lin(blk.attn.q),
                "kv": _lin(blk.attn.kv),
                "proj": _lin(blk.attn.proj),
                "norm2": _ln(blk.norm2),
                "fc1": _lin(blk.mlp.fc1),
                "dwconv": _conv(blk.mlp.dwconv),
                "fc2": _lin(blk.mlp.fc2),
            }
            if blk.attn.sr is not None:
                bp["sr"] = _conv(blk.attn.sr)
                bp["sr_norm"] = _ln(blk.attn.norm)
            stage["blocks"].append(bp)
        stages.append(stage)
    return {"stages": stages}


def test_pvt_v2_matches_reference_module(rng):
    pvt_mod = _load_reference_pvt()
    depths, dims, heads, mlps, srs = TINY_SPEC
    tmodel = pvt_mod.PyramidVisionTransformerV2(
        depths=depths, embed_dims=dims, num_heads=heads, mlp_ratios=mlps,
        sr_ratios=srs, num_classes=0,
        norm_layer=lambda d: nn.LayerNorm(d, eps=1e-6)).eval()

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        tx, feat_size = tmodel.patch_embed(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))
        want = []
        for tstage in tmodel.stages:
            tx, feat_size = tstage(tx, feat_size)
            want.append(tx.numpy().transpose(0, 2, 3, 1))  # -> NHWC

    bb.PVT_SPECS["_tiny"] = TINY_SPEC
    try:
        params = _convert_pvt(tmodel, depths)
        got = bb.pvt_apply(params, jnp.asarray(x), "_tiny")
    finally:
        del bb.PVT_SPECS["_tiny"]

    assert len(got) == 4
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4, rtol=2e-4)


def test_pvt_b0_shapes(rng):
    params = bb.pvt_init(jax.random.PRNGKey(0), "pvt_v2_b0")
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    feats = bb.pvt_apply(params, x, "pvt_v2_b0")
    assert [f.shape for f in feats] == [
        (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 160), (1, 2, 2, 256)]
    assert bb.backbone_channels("pvt_v2_b0") == (32, 64, 160, 256)


def test_prompter_with_pvt_backbone(rng):
    from medsam2_tpu.prompter.dpa_p2pnet import (
        PrompterConfig, prompter_apply, prompter_init)

    cfg = PrompterConfig(backbone="pvt_v2_b0", hidden_dim=32, space=16,
                         use_sr_pfo=False)
    params = prompter_init(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    out, feats = prompter_apply(params, cfg, images)
    assert out["pred_coords"].shape == (1, 16, 2)
    assert out["pred_logits"].shape == (1, 16, 2)
    assert out["pred_masks"].shape == (1, 64, 64)
    assert len(feats) == 4

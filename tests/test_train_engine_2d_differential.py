"""2D (nuclei) engine-level executed-reference training differential.

Runs the reference's OWN 2D train engine — ``func_2d/function.py:train_sam``
(``:27-266``) with its real ``DPAP2PNet`` point_net, ``SAM2Base`` net,
``Criterion`` and the joint AdamW of ``train_2d.py:42-47`` — on CPU with
shared weights for ONE batch. At the first step the similarity memory bank
is empty, so the engine skips memory attention (``function.py:87-89`` adds a
zero parameter) and the whole step is deterministic. Asserts that
:mod:`medsam2_tpu.train.recipe_nuclei` produces

- the same criterion loss components (reg/cls/mask x20, the toolbelt-exact
  dice/focal pair, MaskIoU MSE) — including through the prompter's
  train-mode BatchNorm batch statistics,
- the same post-step parameter updates for the joint AdamW with the
  reference's prompter-only grad clipping (clip_grad=0.1), compared in OUR
  param space by re-running the torch->jax weight converters on the stepped
  torch modules,
- torch-faithful handling of never-trained params: the prompt encoder (only
  ever called under ``torch.no_grad``, ``function.py:140-152``) and BN
  running stats stay exactly frozen; zero-grad-but-in-optimizer params
  (sr_pfo, memory attention, memory encoder, obj_ptr path — all detached or
  unused at step 1) move by exactly the decoupled weight-decay factor in
  ours while torch skips grad-None params (documented, bounded at lr*wd),
- the same memory-bank write (maskmem features + the mean-IoU entry).

``pytorch_toolbelt`` is absent in this environment; its ``BinaryFocalLoss``
and ``DiceLoss`` are stubbed below at the reference's construction defaults
(``criterion.py:41-42``: alpha=None, gamma=2; binary-mode dice pooled over
batch+spatial with smooth=0, eps=1e-7) per the published 0.6.x source —
the stub is the torch-side oracle the JAX losses must match.
"""

import pytest

pytestmark = pytest.mark.slow  # executed-reference differential: heavy CPU compiles, run in the separate `-m slow` lane

import importlib
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from medsam2_tpu.prompter import backbone as bb  # noqa: E402
from medsam2_tpu.prompter import dpa_p2pnet as dpa  # noqa: E402
from medsam2_tpu.prompter.matcher import MatcherConfig  # noqa: E402
from medsam2_tpu.prompter.criterion import CriterionConfig  # noqa: E402
from medsam2_tpu.core.sam2_model import sam2_init  # noqa: E402
from medsam2_tpu.train import recipe_nuclei  # noqa: E402
from medsam2_tpu.state import similarity_bank as sb  # noqa: E402
from medsam2_tpu.checkpoint.convert import convert_state_dict  # noqa: E402

from tests.test_pvt import (TINY_SPEC, _conv, _convert_pvt,  # noqa: E402
                            _load_reference_pvt, _stub)
from tests.test_prompter_differential import (  # noqa: E402
    _load_reference_fpn, _load_reference_dpa, _convert_fpn, _convert_head_mlp)
from tests.test_reference_differential import (  # noqa: E402
    make_diff_config, build_reference_model, load_shared_weights)
from tests.test_video_predictor_differential import _TorchCPUProxy  # noqa: E402

B = 1          # the engine's per-cell tensors assume effectively one image
M = 4          # real cells
MAX_CELLS = 6  # 2 padding slots — exercises the exact-zero padding math
LR, WD, CLIP = 1e-4, 1e-4, 0.1
D = 32         # prompter hidden dim


def _stub_pytorch_toolbelt():
    """pytorch_toolbelt 0.6.x ``BinaryFocalLoss``/``DiceLoss`` at the
    reference's construction defaults (``criterion.py:41-42``)."""
    if "pytorch_toolbelt" in sys.modules:
        return

    class BinaryFocalLoss(nn.Module):
        def __init__(self, alpha=None, gamma=2.0, **kw):
            super().__init__()
            self.alpha, self.gamma = alpha, gamma

        def forward(self, output, target):
            target = target.type_as(output)
            logpt = F.binary_cross_entropy_with_logits(
                output, target, reduction="none")
            pt = torch.exp(-logpt)
            loss = (1.0 - pt).pow(self.gamma) * logpt
            if self.alpha is not None:
                loss = loss * (self.alpha * target
                               + (1.0 - self.alpha) * (1.0 - target))
            return loss.mean()

    class DiceLoss(nn.Module):
        def __init__(self, mode, smooth=0.0, eps=1e-7, **kw):
            super().__init__()
            assert mode == "binary"
            self.smooth, self.eps = smooth, eps

        def forward(self, y_pred, y_true):
            bs = y_true.size(0)
            y_pred = F.logsigmoid(y_pred).exp().view(bs, 1, -1)
            y_true = y_true.view(bs, 1, -1).type_as(y_pred)
            dims = (0, 2)
            inter = torch.sum(y_pred * y_true, dim=dims)
            card = torch.sum(y_pred + y_true, dim=dims)
            score = (2.0 * inter + self.smooth) / (
                card + self.smooth).clamp_min(self.eps)
            loss = (1.0 - score) * (y_true.sum(dims) > 0).to(y_pred.dtype)
            return loss.mean()

    _stub("pytorch_toolbelt")
    _stub("pytorch_toolbelt.losses", BinaryFocalLoss=BinaryFocalLoss,
          DiceLoss=DiceLoss)


def _import_reference_engine():
    if "func_2d.function" in sys.modules:
        return sys.modules["func_2d.function"]
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # torchvision is absent: reuse the AMG differential's stub (nms/batched_nms
    # are real greedy implementations) and add the submodules func_2d/utils
    # imports but train_sam never calls (vutils, hflip/vflip)
    from tests.test_amg_differential import _install_torchvision_stub
    _install_torchvision_stub()
    tv = sys.modules["torchvision"]
    if "torchvision.utils" not in sys.modules:
        vutils = types.ModuleType("torchvision.utils")
        vutils.make_grid = lambda *a, **k: None
        vutils.save_image = lambda *a, **k: None
        tv.utils = vutils
        sys.modules["torchvision.utils"] = vutils
    if "torchvision.transforms.functional" not in sys.modules:
        tf = types.ModuleType("torchvision.transforms.functional")
        tf.hflip = lambda x: torch.flip(x, dims=[-1])
        tf.vflip = lambda x: torch.flip(x, dims=[-2])
        sys.modules["torchvision.transforms"].functional = tf
        sys.modules["torchvision.transforms.functional"] = tf
    _stub("prettytable", PrettyTable=object)
    # eval_map needs mmengine/terminaltables (absent); the engine only takes
    # the symbol, never calls it in train_sam
    if "func_2d.eval_map" not in sys.modules:
        em = types.ModuleType("func_2d.eval_map")
        em.eval_map = None
        sys.modules["func_2d.eval_map"] = em
    argv, orig_cuda = sys.argv, torch.Tensor.cuda
    sys.argv = ["train_2d.py"]  # cfg.parse_args() runs at module import
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        return importlib.import_module("func_2d.function")
    finally:
        sys.argv = argv
        torch.Tensor.cuda = orig_cuda


def _cells(S):
    """M disjoint discs: per-cell masks [M, S, S], centers [M, 2] (x, y)."""
    yy, xx = np.mgrid[0:S, 0:S]
    centers = np.array([[60, 70], [160, 60], [90, 180], [200, 190]], np.float32)
    masks = np.stack([((yy - cy) ** 2 + (xx - cx) ** 2) < 22 ** 2
                      for cx, cy in centers]).astype(np.float32)
    return masks[:M], centers[:M]


def _build_reference_prompter():
    """Reference DPAP2PNet on the vendored PVT + reference FPN (the wiring
    the prompter differential pins), plus the torch->jax weight copy."""
    pvt_mod = _load_reference_pvt()
    fpn_mod = _load_reference_fpn()
    dpa_mod = _load_reference_dpa()
    torch.manual_seed(0)
    depths, dims, heads, mlps, srs = TINY_SPEC
    tpvt = pvt_mod.PyramidVisionTransformerV2(
        depths=depths, embed_dims=dims, num_heads=heads, mlp_ratios=mlps,
        sr_ratios=srs, num_classes=0,
        norm_layer=lambda c: nn.LayerNorm(c, eps=1e-6))
    tneck = fpn_mod.FPN(in_channels=list(dims), out_channels=D, num_outs=4)
    tneck1 = fpn_mod.FPN(in_channels=list(dims), out_channels=D, num_outs=1)

    class RefBackbone(nn.Module):
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

    tsr = dpa_mod.SR_PFO(dropout=0.0, input_dim=D, hidden_dim=2 * D,
                         num_layers=3, output_dim=D)
    tmodel = dpa_mod.DPAP2PNet(RefBackbone(), tsr, num_levels=4,
                               num_classes=1, dropout=0.0, space=16,
                               hidden_dim=D)
    sbn = tmodel.mask_head[1]
    with torch.no_grad():
        sbn.running_mean.copy_(torch.randn(D) * 0.3)
        sbn.running_var.copy_(torch.rand(D) + 0.5)
        sbn.weight.copy_(torch.randn(D) * 0.2 + 1.0)
        sbn.bias.copy_(torch.randn(D) * 0.1)
    return tmodel, (tpvt, tneck, tneck1, tsr, depths)


def _prompter_params_from_torch(tmodel, parts, base):
    tpvt, tneck, tneck1, tsr, depths = parts
    sbn = tmodel.mask_head[1]
    p = dict(base)
    p["backbone"] = _convert_pvt(tpvt, depths)
    p["neck"] = _convert_fpn(tneck, base["neck"])
    p["neck1"] = _convert_fpn(tneck1, base["neck1"])
    p["deform_layer"] = _convert_head_mlp(tmodel.deform_layer)
    p["reg_head"] = _convert_head_mlp(tmodel.reg_head)
    p["cls_head"] = _convert_head_mlp(tmodel.cls_head)
    p["conv"] = _conv(tmodel.conv)
    p["sr_pfo"] = {
        "mlp_p": _convert_head_mlp(tsr.mlp_p),
        "conv1": _conv(tsr.conv[0]),
        "conv2": _conv(tsr.conv[2]),
        "scale": jnp.asarray(tsr.scale.detach().numpy()),
    }
    p["mask_head"] = {
        "conv1": _conv(tmodel.mask_head[0]),
        "bn": {"w": jnp.asarray(sbn.weight.detach().numpy()),
               "b": jnp.asarray(sbn.bias.detach().numpy()),
               "mean": jnp.asarray(sbn.running_mean.numpy()),
               "var": jnp.asarray(sbn.running_var.numpy())},
        "conv2": _conv(tmodel.mask_head[3]),
    }
    return p


class _RecordingCriterion(nn.Module):
    def __init__(self, inner):
        super().__init__()
        self.inner = inner
        self.pred_iou = None

    def train(self, mode=True):
        return self

    def forward(self, outputs1, targets, pred, pred_iou, true2, epoch):
        self.pred_iou = pred_iou.detach().clone()
        return self.inner(outputs1, targets, pred, pred_iou, true2, epoch)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}/{i}"))
    else:
        out[prefix] = np.asarray(tree, np.float64)
    return out


def test_train_engine_2d_differential():
    jax.config.update("jax_platforms", "cpu")
    _stub_pytorch_toolbelt()

    cfg = make_diff_config()          # image_size=256 -> the engine's
    S = cfg.image_size                # hardcoded feat_sizes 64/32/16
    pcfg = dpa.PrompterConfig(backbone="_tiny", num_classes=1, hidden_dim=D,
                              space=16, dropout=0.0, use_sr_pfo=True,
                              mask_norm="bn")
    rcfg = recipe_nuclei.NucleiRecipeConfig(
        prompter=pcfg, matcher=MatcherConfig(),
        criterion=CriterionConfig(num_classes=1),
        memory_bank_size=16, max_cells=MAX_CELLS, lr=LR, weight_decay=WD,
        clip_grad=CLIP, out_size=S)

    # --- shared weights: torch prompter -> ours; our SAM -> torch
    tprompter, parts = _build_reference_prompter()
    bb.PVT_SPECS["_tiny"] = TINY_SPEC
    try:
        params = recipe_nuclei.init_joint_params(jax.random.PRNGKey(0), cfg, rcfg)
        params["prompter"] = _prompter_params_from_torch(
            tprompter, parts, params["prompter"])
        # JAX's CPU backend zero-copies aligned numpy arrays, and the
        # converters build from .numpy() VIEWS of the torch tensors — without
        # a deep copy the engine's in-place opt.step() would silently mutate
        # our params before our step runs
        params["prompter"] = jax.tree_util.tree_map(
            lambda x: jnp.array(np.array(x, copy=True)), params["prompter"])
        net = build_reference_model(cfg)
        load_shared_weights(net, params["sam2"], cfg)

        _run_differential(cfg, rcfg, params, tprompter, parts, net)
    finally:
        del bb.PVT_SPECS["_tiny"]


def _run_differential(cfg, rcfg, params, tprompter, parts, net):
    S = cfg.image_size
    mod = _import_reference_engine()

    rng = np.random.default_rng(3)
    image = rng.standard_normal((S, S, 3)).astype(np.float32) * 0.4
    cell_masks, centers = _cells(S)
    semantic = (cell_masks.sum(0) > 0).astype(np.float32)

    # --- reference loader tuple (func_2d/monuseg.py:161): point labels are
    # labels_choose = type - 1 = 0 for single-class nuclei
    timg = torch.from_numpy(image.transpose(2, 0, 1))[None]
    pack = (
        timg,                                               # images
        torch.from_numpy(cell_masks)[None].long(),          # inst_masks
        torch.from_numpy(centers)[None, :, None, :],        # points_choose
        torch.zeros((1, M, 1)),                             # labels_choose
        torch.from_numpy(centers)[None],                    # points_list
        torch.zeros((1, M), dtype=torch.long),              # labels_list
        torch.as_tensor([M]),                               # cell_nums
        torch.from_numpy(semantic)[None],                   # masks
        torch.as_tensor([[S, S]]),                          # ori_shape
    )
    args_ns = types.SimpleNamespace(out_size=S, memory_bank_size=16,
                                    clip_grad=CLIP, print_freq=10,
                                    gpu_device=0)

    crit_mod = importlib.import_module("sam2_train.modeling.criterion")
    stub_cfg = types.SimpleNamespace(
        data=types.SimpleNamespace(num_classes=1),
        criterion=types.SimpleNamespace(
            eos_coef=0.3, loss_focal=1.0, loss_dice=1.0, loss_iou=1.0,
            loss_dice_semantic=1.0, cls_loss_coef=1.0, reg_loss_coef=1.0,
            mask_loss_coef=1.0, sam2_loss_coef=1.0,
            matcher=types.SimpleNamespace(set_cost_point=0.1,
                                          set_cost_class=1.0)))
    criterion, matcher = crit_mod.build_criterion(stub_cfg,
                                                  torch.device("cpu"))
    criterion = _RecordingCriterion(criterion)

    opt = torch.optim.AdamW(
        [p for p in list(tprompter.parameters()) + list(net.parameters())
         if p.requires_grad], lr=LR, weight_decay=WD)

    maskmem_rec = []
    orig_enc = net._encode_new_memory

    def recording_enc(*a, **k):
        feats, pos = orig_enc(*a, **k)
        maskmem_rec.append(feats.detach().clone())
        return feats, pos

    net._encode_new_memory = recording_enc

    orig_to = torch.Tensor.to

    def cpu_to(self, *a, **k):
        a = tuple("cpu" if (isinstance(x, str) and "cuda" in x)
                  or (isinstance(x, torch.device) and x.type == "cuda")
                  else x for x in a)
        dev = k.get("device")
        if dev is not None and "cuda" in str(dev):
            k = dict(k, device="cpu")
        return orig_to(self, *a, **k)

    orig_mod_torch = mod.torch
    orig_cuda = torch.Tensor.cuda
    mod.torch = _TorchCPUProxy(torch)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.Tensor.to = cpu_to
    try:
        log_info = mod.train_sam(args_ns, tprompter, net, matcher, [pack],
                                 criterion, opt, epoch=0, writer=None)
    finally:
        mod.torch = orig_mod_torch
        torch.Tensor.cuda = orig_cuda
        torch.Tensor.to = orig_to
        net._encode_new_memory = orig_enc

    # --- ours: one train step on the identical batch, empty bank
    batch = {
        "images": jnp.asarray(image)[None],
        "gt_points": jnp.zeros((B, MAX_CELLS, 2), jnp.float32)
        .at[0, :M].set(jnp.asarray(centers)),
        "gt_labels": jnp.zeros((B, MAX_CELLS), jnp.int32),
        "gt_valid": jnp.zeros((B, MAX_CELLS), bool).at[0, :M].set(True),
        "gt_cell_masks": jnp.zeros((B, MAX_CELLS, S, S), jnp.float32)
        .at[0, :M].set(jnp.asarray(cell_masks)),
        "gt_semantic": jnp.asarray(semantic)[None],
    }
    P = cfg.sam_image_embedding_size ** 2
    bank = sb.init_similarity_bank(rcfg.memory_bank_size, P, cfg.mem_dim,
                                   P * cfg.hidden_dim)
    tx = recipe_nuclei.make_optimizer_nuclei(rcfg)
    step = recipe_nuclei.make_train_step_nuclei(cfg, rcfg, tx)
    before = _flatten(params)
    new_params, _, new_bank, metrics = step(
        params, tx.init(params), batch, bank, jax.random.PRNGKey(7),
        bank_nonempty=False)

    # --- loss components
    for k in ("loss_reg", "loss_cls", "loss_mask", "loss_focal", "loss_dice",
              "loss_iou"):
        np.testing.assert_allclose(
            float(metrics[k]), float(log_info[k]), rtol=2e-3, atol=1e-6,
            err_msg=f"{k} diverges from the executed reference engine")

    # --- memory-bank write: maskmem features (ref NCHW -> flat HWC) + iou
    assert len(maskmem_rec) == 1
    ref_mem = maskmem_rec[0][0].permute(1, 2, 0).reshape(P, cfg.mem_dim)
    np.testing.assert_allclose(
        np.asarray(new_bank["feats"][0], np.float32), ref_mem.numpy(),
        rtol=2e-3, atol=2e-4, err_msg="bank maskmem write diverges")
    ref_iou = float(criterion.pred_iou.mean())
    np.testing.assert_allclose(float(new_bank["iou"][0]), ref_iou, rtol=2e-3)
    assert bool(new_bank["valid"][0]) and not bool(new_bank["valid"][1])

    # --- post-step updates, compared in OUR param space (the converters are
    # layout-only, so re-converting the stepped torch modules yields the
    # reference's post-step values in our tree)
    ref_after = {
        "prompter": _prompter_params_from_torch(
            tprompter, parts, params["prompter"]),
        "sam2": convert_state_dict(
            {k: v.detach().numpy() for k, v in net.state_dict().items()}, cfg),
    }
    after_ref = _flatten(ref_after)
    after_ours = _flatten(new_params)
    assert after_ref.keys() == after_ours.keys() == before.keys()

    d_ref_all, d_ours_all = [], []
    n_frozen = n_decay = 0
    for k in before:
        b, r, o = before[k], after_ref[k], after_ours[k]
        if "/sam_prompt_encoder/" in k or k.endswith(("/bn/mean", "/bn/var")):
            if k.endswith(("/bn/mean", "/bn/var")):
                # torch train-mode BN EMAs the running stats in the forward;
                # ours EMAs them post-step — values, not Adam updates
                np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-6,
                                           err_msg=f"BN stat {k}")
            else:
                # never trained in the reference (torch.no_grad) -> frozen
                np.testing.assert_array_equal(o, b, err_msg=f"frozen {k}")
                np.testing.assert_allclose(r, b, atol=1e-12,
                                           err_msg=f"frozen {k} moved (ref)")
            n_frozen += 1
            continue
        if np.array_equal(r, b):
            # grad-None in torch (detached / unused at step 1): AdamW skips
            # it; ours applies exactly the decoupled weight decay
            np.testing.assert_allclose(
                o, b * (1.0 - LR * WD), rtol=1e-6, atol=1e-10,
                err_msg=f"zero-grad leaf {k}: expected pure wd decay")
            n_decay += 1
            continue
        d_ref_all.append(((r - b) / LR).ravel())
        d_ours_all.append(((o - b) / LR).ravel())
    assert n_frozen > 4 and n_decay > 0

    d_ref = np.concatenate(d_ref_all)
    d_ours = np.concatenate(d_ours_all)
    assert np.abs(d_ref).max() > 0.1  # the step actually moved
    frac_bad = float((np.abs(d_ours - d_ref) > 0.02).mean())
    rel_l2 = float(np.linalg.norm(d_ours - d_ref)
                   / max(np.linalg.norm(d_ref), 1e-12))
    # same quantile-robust criterion as the 3D engine differential: Adam's
    # eps-knee makes isolated near-zero-gradient elements pure noise
    assert frac_bad <= 2e-3 and rel_l2 <= 2e-2, (
        f"joint update mismatch: {frac_bad:.2e} elements outside atol 0.02, "
        f"relative L2 {rel_l2:.2e}")

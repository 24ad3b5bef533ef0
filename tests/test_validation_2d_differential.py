"""2D (nuclei) validation-engine executed-reference differential.

Runs the reference's OWN 2D eval engine — ``func_2d/function.py:validation_sam``
(``:268-678``) with its real ``DPAP2PNet``, ``SAM2Base``, ``predict()``,
``mask_post_eval`` and the metric stack (``stats_utils``) — on CPU with shared
weights for ONE image sized exactly one crop, so the similarity memory bank is
empty at decode time and the whole pass is deterministic (the engine's
torch.multinomial bank read is never reached). Asserts that
:func:`medsam2_tpu.api.nuclei_inference.predict_instances` produces

- the SAME instance partition (label-renaming-invariant pixel partition of
  the final painted map, incl. the reference's overwrite-on-partial-overlap
  paint rule and id gaps),
- the same metric values through our :mod:`medsam2_tpu.metrics.instance`
  (dice1/dice2/AJI/AJI+/DQ/SQ/PQ vs the engine's returned means),
- the same post-pass memory-bank write (the engine writes each decoded
  crop's union mask into the bank even during validation).

Building this differential surfaced (and the fixes are pinned here): the
paint rule (the reference paints a mask whenever ANY pixel is uncovered,
overwriting earlier instances — not skip-on-touch), merge scores being raw
predicted IoUs (not IoU x stability), the semantic-mask point ``filtering``
mode of ``predict()``, eval-time bank writes, and the memory encoder
consuming the memory-CONDITIONED top feature.
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

from medsam2_tpu.prompter import backbone as bb  # noqa: E402
from medsam2_tpu.prompter import dpa_p2pnet as dpa  # noqa: E402
from medsam2_tpu.prompter.matcher import MatcherConfig  # noqa: E402
from medsam2_tpu.prompter.criterion import CriterionConfig  # noqa: E402
from medsam2_tpu.train import recipe_nuclei  # noqa: E402
from medsam2_tpu.state import similarity_bank as sb  # noqa: E402
from medsam2_tpu.api import nuclei_inference as ni  # noqa: E402
from medsam2_tpu.metrics import instance as mi  # noqa: E402

from tests.test_pvt import TINY_SPEC  # noqa: E402
from tests.test_reference_differential import (  # noqa: E402
    make_diff_config, build_reference_model, load_shared_weights)
from tests.test_train_engine_2d_differential import (  # noqa: E402
    _build_reference_prompter, _prompter_params_from_torch,
    _import_reference_engine)
from tests.test_video_predictor_differential import _TorchCPUProxy  # noqa: E402

D = 32


def _partition_equal(a: np.ndarray, b: np.ndarray) -> bool:
    """True iff the two int maps induce the same pixel partition (labels may
    be renamed; background 0 must coincide)."""
    if (a > 0).sum() != (b > 0).sum() or not np.array_equal(a > 0, b > 0):
        return False
    pairs = np.unique(np.stack([a[a > 0], b[a > 0]]), axis=1)
    return (len(np.unique(pairs[0])) == pairs.shape[1]
            and len(np.unique(pairs[1])) == pairs.shape[1])


def test_validation_engine_2d_differential(tmp_path):
    cfg = make_diff_config()
    S = cfg.image_size
    pcfg = dpa.PrompterConfig(backbone="_tiny", num_classes=1, hidden_dim=D,
                              space=16, dropout=0.0, use_sr_pfo=True,
                              mask_norm="bn")
    rcfg = recipe_nuclei.NucleiRecipeConfig(
        prompter=pcfg, matcher=MatcherConfig(),
        criterion=CriterionConfig(num_classes=1), out_size=S)

    tprompter, parts = _build_reference_prompter()
    bb.PVT_SPECS["_tiny"] = TINY_SPEC
    try:
        params = recipe_nuclei.init_joint_params(jax.random.PRNGKey(0), cfg, rcfg)
        params["prompter"] = _prompter_params_from_torch(
            tprompter, parts, params["prompter"])
        params["prompter"] = jax.tree_util.tree_map(
            lambda x: jnp.array(np.array(x, copy=True)), params["prompter"])
        net = build_reference_model(cfg)
        load_shared_weights(net, params["sam2"], cfg)
        _run(cfg, rcfg, params, tprompter, net, tmp_path)
    finally:
        del bb.PVT_SPECS["_tiny"]


def _run(cfg, rcfg, params, tprompter, net, tmp_path):
    S = cfg.image_size
    mod = _import_reference_engine()

    # synthetic image with blob-ish structure so the random-weight prompter
    # emits a non-trivial point set and non-empty instances
    rng = np.random.default_rng(11)
    base = rng.standard_normal((S // 8, S // 8, 3)).astype(np.float32)
    image = np.asarray(jax.image.resize(jnp.asarray(base), (S, S, 3),
                                        "linear")) * 0.8
    yy, xx = np.mgrid[0:S, 0:S]
    gt_inst = np.zeros((S, S), np.int64)
    for i, (cx, cy) in enumerate([(60, 70), (160, 60), (90, 180), (200, 190)]):
        gt_inst[((yy - cy) ** 2 + (xx - cx) ** 2) < 22 ** 2] = i + 1

    timg = torch.from_numpy(image.transpose(2, 0, 1))[None]
    n_gt_pts = 4
    pack = (
        timg,                                       # images (vis only)
        timg,                                       # img_seg (the model input)
        torch.from_numpy(gt_inst)[None],            # inst_maps
        torch.from_numpy((gt_inst > 0).astype(np.int64))[None],  # type_maps
        # batched loader shape: len(gt_points) == 1, so the engine's
        # cell_nums=[1] broadcasts inside the decoder (function.py:497)
        torch.zeros((1, n_gt_pts, 2)),              # gt_points
        torch.zeros((1, n_gt_pts)),                 # labels
        torch.from_numpy((gt_inst > 0).astype(np.float32)),      # bi_masks
        torch.as_tensor([[S, S]]),                  # ori_shape
        torch.as_tensor([0]),                       # file_inds
        ("img0",),                                  # name
    )
    args_ns = types.SimpleNamespace(
        crop_size=S, overlap=64, out_size=S, vis=1,
        path_helper={"sample_path": str(tmp_path)})
    cfgs_ns = types.SimpleNamespace(
        test=types.SimpleNamespace(filtering=True, nms_thr=12.0))
    # random-weight masks are near-image-sized, so a 0.6 box-NMS collapses
    # them to one survivor; 1.0 (keep-all, order-only) exercises the full
    # keep-best + overwrite-paint merge on both sides identically
    iou_threshold = 1.0

    bank_rec = []
    orig_enc = net._encode_new_memory

    def recording_enc(*a, **k):
        feats, pos = orig_enc(*a, **k)
        bank_rec.append(feats.detach().clone())
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
    # the engine's unconditional first-image visualization needs cv2 (absent
    # here) — the images are irrelevant to the differential, so stub the two
    # vis entry points
    orig_vis = (mod.vis_inst_image, mod.vis_compare_point)
    rec = {}

    def rec_vis(img, pred, gt, path, **k):
        # vis_inst_image receives the final painted b_inst_map
        # (function.py:663) — capture it for the partition comparison
        rec["map"] = pred.squeeze().numpy().astype(np.int64)

    mod.vis_inst_image = rec_vis
    mod.vis_compare_point = lambda *a, **k: None
    mod.torch = _TorchCPUProxy(torch)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.Tensor.to = cpu_to
    try:
        ref = mod.validation_sam(args_ns, cfgs_ns, [pack], 0, tprompter, net,
                                 num_classes=1, iou_threshold=iou_threshold,
                                 calc_map=False)
    finally:
        mod.torch = orig_mod_torch
        torch.Tensor.cuda = orig_cuda
        torch.Tensor.to = orig_to
        net._encode_new_memory = orig_enc
        mod.vis_inst_image, mod.vis_compare_point = orig_vis
    ref_dice1, ref_dice2, ref_aji, ref_aji_p, ref_dq, ref_sq, ref_pq = ref

    # --- ours
    P = cfg.sam_image_embedding_size ** 2
    bank = sb.init_similarity_bank(16, P, cfg.mem_dim, P * cfg.hidden_dim)
    inst = ni.predict_instances(
        params, cfg, rcfg, {"image": image}, bank, jax.random.PRNGKey(3),
        crop_size=S, overlap=64, point_nms_dist=cfgs_ns.test.nms_thr,
        mask_nms_thresh=iou_threshold, filtering=True, write_bank=True)

    assert inst.max() > 0, "differential needs a non-empty prediction"

    # --- pixel-partition equality with the reference's own painted map
    # (captured through the vis hook; labels may be renamed)
    assert "map" in rec
    assert _partition_equal(np.asarray(inst, np.int64), rec["map"]), (
        "final instance partition diverges from the executed reference "
        f"(ours {len(np.unique(inst))} labels, ref {len(np.unique(rec['map']))})")

    # --- the metric stack on the same maps must reproduce the engine's
    # returned values (pins metrics/instance.py end-to-end too)
    GT = mi.remap_label(gt_inst)
    PRED = mi.remap_label(inst)
    ours = {
        "dice1": mi.get_dice_1(GT, PRED),
        "dice2": mi.get_fast_dice_2(GT, PRED),
        "aji": mi.get_fast_aji(GT, PRED),
        "aji_p": mi.get_fast_aji_plus(GT, PRED),
    }
    dq, sq, pq = mi.get_fast_pq(GT, PRED)[0]
    ours.update({"dq": dq, "sq": sq, "pq": pq})
    want = {"dice1": ref_dice1, "dice2": ref_dice2, "aji": ref_aji,
            "aji_p": ref_aji_p, "dq": ref_dq, "sq": ref_sq, "pq": ref_pq}
    for k in want:
        np.testing.assert_allclose(
            ours[k], want[k], rtol=1e-6, atol=1e-9,
            err_msg=f"validation metric {k} diverges from the executed "
                    f"reference engine")

    # --- memory-bank write parity: the engine encoded exactly one crop's
    # union mask; ours wrote the same memory (NCHW -> flat HWC)
    assert len(bank_rec) == 1
    ref_mem = bank_rec[0][0].permute(1, 2, 0).reshape(P, cfg.mem_dim)
    assert bool(np.asarray(bank["valid"][0]))
    np.testing.assert_allclose(
        np.asarray(bank["feats"][0], np.float32), ref_mem.numpy(),
        rtol=2e-3, atol=2e-4, err_msg="eval-time bank write diverges")

"""3D validation-engine executed-reference differential.

Runs the reference's OWN 3D eval engine — ``func_3d/function.py:validation_sam``
(``:198-314``) with its real ``SAM2VideoPredictor`` — on CPU with shared
weights over a two-volume loader, and asserts that
:func:`medsam2_tpu.cli.train_3d.validation_sam` returns

- the same validation loss (the engine's ``criterion_G`` =
  BCEWithLogits(pos_weight=2) over raw video-res logits — the sigmoid at
  ``function.py:283`` is commented out),
- the same threshold-averaged IoU and Dice (``eval_seg`` over thresholds
  (0.1, 0.3, 0.5, 0.7, 0.9) applied to the raw logits, ``utils.py:190-203``),
- under the reference's exact normalization: per-volume sums divided by that
  volume's ``len(frame_id) * len(obj_list)`` (``function.py:300-303``), then
  a mean over ``n_val = len(val_loader)`` (``:202,305-314``) — NOT a global
  per-(frame, obj) mean (volumes with different object counts weight
  differently under the two schemes; volume 2 here has 1 object vs 2).

The loader also covers the engine's KeyError fallback: volume 2's object has
a bbox prompt only on frame 0, so prompt frame 2 falls through to the
zero-mask ``train_add_new_mask`` branch (``function.py:119-127``).
"""

import pytest

pytestmark = pytest.mark.slow  # executed-reference differential: heavy CPU compiles, run in the separate `-m slow` lane

import types

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")

from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.cli import train_3d as cli3d

from tests.test_reference_differential import (
    make_diff_config, build_reference_model, load_shared_weights, make_video)
from tests.test_video_predictor_differential import _TorchCPUProxy
from tests.test_train_engine_differential import (
    _import_reference_engine, _bboxes, _gt_masks, T, O, PROMPT_FREQ)


def _vol1_gt(S):
    """Single-object (the square) gt for volume 2."""
    return _gt_masks(S)[:, :1]


def test_validation_engine_differential():
    cfg = make_diff_config()
    S = cfg.image_size
    params = sam2_init(jax.random.PRNGKey(0), cfg)

    mod = _import_reference_engine()
    ref = build_reference_model(cfg, predictor=True, fill_hole_area=0,
                                non_overlap_masks=False)
    load_shared_weights(ref, params, cfg)

    vid0 = make_video(T=T, S=S, seed=0)
    vid1 = make_video(T=T, S=S, seed=3)
    gt0 = _gt_masks(S)              # [T, 2, S, S]
    gt1 = _vol1_gt(S)               # [T, 1, S, S]
    boxes = _bboxes(vid0)           # [T, O, 4] xyxy

    # --- reference packs. vol0: 2 objects, bboxes on both prompt frames.
    # vol1: 1 object, bbox only on frame 0 -> KeyError zero-mask on frame 2.
    def ref_pack(video01, gt, bbox_frames_per_obj, name):
        n_obj = gt.shape[1]
        return {
            "image": torch.from_numpy(video01 * 255.0)[None],
            "label": {t: {o: torch.from_numpy(gt[t, o])[None, None]
                          for o in range(n_obj)} for t in range(T)},
            "bbox": {f: {o: torch.from_numpy(boxes[f, o])[None]
                         for o in objs}
                     for f, objs in bbox_frames_per_obj.items()},
            "image_meta_dict": {"filename_or_obj": [name]},
        }

    pack0 = ref_pack(vid0, gt0, {0: (0, 1), 2: (0, 1)}, "vol0")
    pack1 = ref_pack(vid1, gt1, {0: (0,)}, "vol1")

    args_ns = types.SimpleNamespace(prompt="bbox", prompt_freq=PROMPT_FREQ,
                                    vis=False, gpu_device=0)

    import sam2_train.sam2_video_predictor as vp_mod

    orig_mod_torch, orig_vp_torch = mod.torch, vp_mod.torch
    orig_cuda = torch.Tensor.cuda
    orig_dev = mod.GPUdevice
    mod.torch = _TorchCPUProxy(torch)
    vp_mod.torch = _TorchCPUProxy(torch)
    torch.Tensor.cuda = lambda self, *a, **k: self
    mod.GPUdevice = torch.device("cpu")
    try:
        ref_loss, (ref_iou, ref_dice) = mod.validation_sam(
            args_ns, [pack0, pack1], 0, ref)
    finally:
        mod.torch, vp_mod.torch = orig_mod_torch, orig_vp_torch
        torch.Tensor.cuda = orig_cuda
        mod.GPUdevice = orig_dev

    # --- ours: cli/train_3d.validation_sam over the same two volumes in the
    # rebuild's loader contract ([0,1] images, [1,S,S] labels, xyxy bboxes)
    def our_sample(video01, gt, bbox_frames_per_obj, name):
        n_obj = gt.shape[1]
        return {
            "image": video01.astype(np.float32),
            "label": {t: {o: gt[t, o][None] for o in range(n_obj)}
                      for t in range(T)},
            "bbox": {f: {o: boxes[f, o] for o in objs}
                     for f, objs in bbox_frames_per_obj.items()},
            "image_meta_dict": {"filename_or_obj": name},
        }

    loader = [[our_sample(vid0, gt0, {0: (0, 1), 2: (0, 1)}, "vol0")],
              [our_sample(vid1, gt1, {0: (0,)}, "vol1")]]
    out = cli3d.validation_sam(args_ns, cfg, params, loader, logger=None)

    np.testing.assert_allclose(out["loss"], float(ref_loss), rtol=2e-3,
                               err_msg="validation BCE loss diverges")
    np.testing.assert_allclose(out["iou"], float(ref_iou), rtol=5e-3,
                               atol=5e-4, err_msg="threshold-avg IoU diverges")
    np.testing.assert_allclose(out["dice"], float(ref_dice), rtol=5e-3,
                               atol=5e-4, err_msg="threshold-avg Dice diverges")
    # the two volumes must actually weight differently under a global
    # per-pair mean (guards the normalization assertion from passing trivially)
    assert gt0.shape[1] != gt1.shape[1]

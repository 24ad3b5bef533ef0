"""Differential AMG oracle: run the *reference's own*
``SAM2AutomaticMaskGenerator`` + ``SAM2ImagePredictor``
(``/root/reference/sam2_train/automatic_mask_generator.py``,
``sam2_image_predictor.py``) on CPU torch with shared weights, and assert our
end-to-end ``generate()`` emits the same annotations: same survivors in the
same order, matching masks/boxes/scores.

This pins the composite pipeline the per-module oracles can't: point-grid
scaling (``transform_coords``), multimask flattening + candidate order
(``_process_batch``, ``automatic_mask_generator.py:302-310``), stability
scoring on the upsampled masks, box extraction, crop-edge filtering,
per-crop box NMS with iou_pred scores, crop generation + uncropping and
cross-crop NMS (``:219-229``), the m2m refinement loop (``:417-434``, every
flattened candidate re-fed with its point, logits clamped to +/-32 at the
predictor boundary, ``sam2_image_predictor.py:414``), and the RLE output
contract.

torchvision isn't installed in this environment; the reference only touches
``ops.boxes.batched_nms``/``box_area`` and ``transforms
.Resize/Normalize/ToTensor``, so a faithful stub (same documented semantics:
greedy score-descending NMS suppressing IoU > threshold; antialiased
bilinear tensor resize) is installed into ``sys.modules`` before the
reference modules import.
"""

import pytest

pytestmark = pytest.mark.slow  # executed-reference differential: heavy CPU compiles, run in the separate `-m slow` lane

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.api.automatic_mask_generator import SAM2AutomaticMaskGenerator
from medsam2_tpu.postproc import amg_utils as amg

from tests.test_reference_differential import (
    make_diff_config,
    build_reference_model,
    load_shared_weights,
)


# ---------------------------------------------------------------------------
# torchvision stub (only the symbols the reference AMG path imports)
# ---------------------------------------------------------------------------


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    import torch.nn as nn
    import torch.nn.functional as F

    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def _nms(boxes, scores, iou_threshold):
        # torchvision.ops.nms: greedy by descending score, suppress
        # IoU > iou_threshold; returns kept indices in score order
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(int(i))
            if order.numel() == 1:
                break
            rest = order[1:]
            lt = torch.maximum(boxes[i, :2], boxes[rest, :2])
            rb = torch.minimum(boxes[i, 2:], boxes[rest, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[:, 0] * wh[:, 1]
            iou = inter / (box_area(boxes[i : i + 1]) + box_area(boxes[rest]) - inter)
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(keep, dtype=torch.int64)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.int64)
        # category-offset trick, as torchvision implements it
        offsets = idxs.to(boxes) * (boxes.max() + torch.tensor(1).to(boxes))
        return _nms(boxes + offsets[:, None], scores, iou_threshold)

    class Resize(nn.Module):
        def __init__(self, size):
            super().__init__()
            self.size = tuple(size)

        def forward(self, x):
            # torchvision's tensor path: antialiased bilinear, half-pixel
            return F.interpolate(
                x.unsqueeze(0), size=self.size, mode="bilinear",
                align_corners=False, antialias=True,
            ).squeeze(0)

    class Normalize(nn.Module):
        def __init__(self, mean, std):
            super().__init__()
            self.register_buffer("m", torch.tensor(mean).view(-1, 1, 1))
            self.register_buffer("s", torch.tensor(std).view(-1, 1, 1))

        def forward(self, x):
            return (x - self.m) / self.s

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
            if t.dtype == torch.uint8:
                return t.float() / 255.0
            return t.float()

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    transforms_mod = types.ModuleType("torchvision.transforms")
    boxes_mod.nms = _nms
    boxes_mod.batched_nms = batched_nms
    boxes_mod.box_area = box_area
    ops.boxes = boxes_mod
    transforms_mod.Resize = Resize
    transforms_mod.Normalize = Normalize
    transforms_mod.ToTensor = ToTensor
    tv.ops = ops
    tv.transforms = transforms_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod
    sys.modules["torchvision.transforms"] = transforms_mod


def _build_reference_amg(cfg, params, **amg_kw):
    model = build_reference_model(cfg)  # installs the sam2_train stub parent
    load_shared_weights(model, params, cfg)
    _install_torchvision_stub()
    import importlib

    amg_mod = importlib.import_module("sam2_train.automatic_mask_generator")
    # SAM2Transforms scripts its Resize/Normalize stack; the stub modules are
    # plain eager nn.Modules, so run scripting as identity while constructing
    orig_script = torch.jit.script
    torch.jit.script = lambda m, *a, **k: m
    try:
        gen = amg_mod.SAM2AutomaticMaskGenerator(model, **amg_kw)
    finally:
        torch.jit.script = orig_script
    # the fork hardcodes the 1024-px feature-map sizes (256/128/64,
    # sam2_image_predictor.py:59-63); fix them up for the differential's
    # 256-px config, like the cell_nums shim in build_reference_model
    s = cfg.image_size // 4
    gen.predictor._bb_feat_sizes = [(s, s), (s // 2, s // 2), (s // 4, s // 4)]
    return gen


# ---------------------------------------------------------------------------
# Shared inputs
# ---------------------------------------------------------------------------

AMG_KW = dict(
    points_per_side=4,
    points_per_batch=6,   # forces a partial final batch through the iterator
    pred_iou_thresh=0.0,
    stability_score_thresh=0.0,   # keep every candidate: exercises NMS under load
    box_nms_thresh=0.7,
    crop_n_layers=0,
    min_mask_region_area=0,
    output_mode="uncompressed_rle",
    multimask_output=True,
)


@pytest.fixture(scope="module")
def shared():
    cfg = make_diff_config()
    params = sam2_init(pytest.importorskip("jax").random.PRNGKey(11), cfg)
    # smooth deterministic image: keeps mask boundaries away from knife-edge
    # logit ties so fp32 CPU/JAX rounding can't flip threshold pixels
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
    img = np.stack(
        [
            127 + 90 * np.sin(xx / 37.0) * np.cos(yy / 53.0),
            127 + 90 * np.cos((xx + yy) / 71.0),
            127 + 90 * np.sin(yy / 29.0),
        ],
        axis=-1,
    )
    img = np.clip(img, 0, 255).astype(np.uint8)
    return cfg, params, img


def _run_pair(cfg, params, img, **overrides):
    kw = dict(AMG_KW, **overrides)
    ref_anns = _build_reference_amg(cfg, params, **kw).generate(img)
    our_anns = SAM2AutomaticMaskGenerator(params, cfg, **kw).generate(img)
    return ref_anns, our_anns


def _compare_anns(ref_anns, our_anns):
    assert len(ref_anns) == len(our_anns) > 0
    for r, o in zip(ref_anns, our_anns):
        np.testing.assert_allclose(r["point_coords"], o["point_coords"], atol=1e-4)
        np.testing.assert_allclose(
            r["predicted_iou"], o["predicted_iou"], rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(
            r["stability_score"], o["stability_score"], rtol=5e-3, atol=5e-4)
        assert r["crop_box"] == o["crop_box"]
        np.testing.assert_allclose(r["bbox"], o["bbox"], atol=2)
        rm = amg.rle_to_mask(
            {"size": r["segmentation"]["size"], "counts": list(r["segmentation"]["counts"])})
        om = amg.rle_to_mask(o["segmentation"])
        inter = np.logical_and(rm, om).sum()
        union = np.logical_or(rm, om).sum()
        assert union > 0 and inter / union > 0.99, (inter, union)
        assert abs(int(r["area"]) - int(o["area"])) <= 0.01 * max(r["area"], 1)


def test_amg_differential_single_crop(shared):
    cfg, params, img = shared
    ref_anns, our_anns = _run_pair(cfg, params, img)
    _compare_anns(ref_anns, our_anns)


def test_amg_differential_crop_layers(shared):
    """crop_n_layers=1: crops resize through the preprocessing (real
    bilinear work), per-crop NMS, uncropping, crop-edge filtering, and the
    cross-crop NMS preferring smaller crops (``:219-229``)."""
    cfg, params, img = shared
    ref_anns, our_anns = _run_pair(
        cfg, params, img, crop_n_layers=1, crop_n_points_downscale_factor=2)
    _compare_anns(ref_anns, our_anns)


def test_amg_differential_m2m(shared):
    """use_m2m=True: every flattened candidate re-fed as a clamped mask
    prompt with its point; single-mask output goes through the decoder's
    dynamic-stability selection (``mask_decoder.py:281-317``)."""
    cfg, params, img = shared
    ref_anns, our_anns = _run_pair(cfg, params, img, use_m2m=True)
    _compare_anns(ref_anns, our_anns)


# ---------------------------------------------------------------------------
# SAM2ImagePredictor differential (predict(): boxes, mask_input, multimask
# selection, normalize_coords, non-square postprocess — the interactive API
# the AMG never drives)
# ---------------------------------------------------------------------------


def _build_reference_predictor(cfg, params):
    model = build_reference_model(cfg)
    load_shared_weights(model, params, cfg)
    _install_torchvision_stub()
    import importlib

    ip_mod = importlib.import_module("sam2_train.sam2_image_predictor")
    orig_script = torch.jit.script
    torch.jit.script = lambda m, *a, **k: m
    try:
        pred = ip_mod.SAM2ImagePredictor(model)
    finally:
        torch.jit.script = orig_script
    s = cfg.image_size // 4
    pred._bb_feat_sizes = [(s, s), (s // 2, s // 2), (s // 4, s // 4)]
    return pred


@pytest.fixture(scope="module")
def predictors(shared):
    from medsam2_tpu.api.image_predictor import SAM2ImagePredictor

    cfg, params, img = shared
    # non-square original: exercises per-axis coord normalization, the
    # antialiased downscale (w: 320->256) + upscale (h: 200->256), and
    # postprocess_masks back to orig_hw (sam2_image_predictor.py:410-417)
    img_ns = np.ascontiguousarray(img[:200, :320])
    ref = _build_reference_predictor(cfg, params)
    ref.set_image(img_ns)
    ours = SAM2ImagePredictor(params, cfg)
    ours.set_image(img_ns)
    return ref, ours, img_ns


def _compare_predict(ref_out, our_out, logit_tol=5e-3):
    rm, ri, rl = ref_out
    om, oi, ol = our_out
    assert rm.shape == om.shape and rl.shape == ol.shape
    np.testing.assert_allclose(ri, oi, rtol=2e-3, atol=2e-4)
    # logits at orig resolution; tiny fp32 divergence scaled by interpolation
    np.testing.assert_allclose(rm, om, atol=logit_tol, rtol=1e-3)
    np.testing.assert_allclose(rl, ol, atol=logit_tol, rtol=1e-3)


def test_image_predictor_differential_points(predictors):
    ref, ours, img = predictors
    pts = np.array([[250.0, 120.0]], np.float32)
    lbl = np.array([1], np.int32)
    _compare_predict(
        ref.predict(pts, lbl, multimask_output=True, return_logits=True),
        ours.predict(pts, lbl, multimask_output=True, return_logits=True))


def test_image_predictor_differential_box(predictors):
    ref, ours, img = predictors
    box = np.array([40.0, 30.0, 280.0, 170.0], np.float32)
    _compare_predict(
        ref.predict(box=box, multimask_output=False, return_logits=True),
        ours.predict(box=box, multimask_output=False, return_logits=True))


def test_image_predictor_differential_mask_input_iteration(predictors):
    """Two-round interactive flow: the first round's clamped low-res logits
    re-fed as mask_input with an extra negative click, multimask_output=False
    (dynamic-stability selection active)."""
    ref, ours, img = predictors
    pts = np.array([[250.0, 120.0], [60.0, 60.0]], np.float32)
    lbl = np.array([1, 0], np.int32)
    _, _, ref_low = ref.predict(pts[:1], lbl[:1], multimask_output=True,
                                return_logits=True)
    _, _, our_low = ours.predict(pts[:1], lbl[:1], multimask_output=True,
                                 return_logits=True)
    best = 0  # deterministic pick; both sides use the same index
    _compare_predict(
        ref.predict(pts, lbl, mask_input=ref_low[best : best + 1],
                    multimask_output=False, return_logits=True),
        ours.predict(pts, lbl, mask_input=our_low[best : best + 1],
                     multimask_output=False, return_logits=True))


def test_image_predictor_differential_normalized_coords(predictors):
    ref, ours, img = predictors
    pts = np.array([[0.7, 0.4]], np.float32)
    lbl = np.array([1], np.int32)
    _compare_predict(
        ref.predict(pts, lbl, multimask_output=True, return_logits=True,
                    normalize_coords=False),
        ours.predict(pts, lbl, multimask_output=True, return_logits=True,
                     normalize_coords=False))

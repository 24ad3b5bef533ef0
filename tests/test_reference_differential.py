"""Differential full-model oracle: run the *reference's own modules*
(``/root/reference/sam2_train/modeling``) with shared weights and assert our
``track_step`` + multi-frame propagation matches end to end.

Unlike the per-module torch oracles (which re-derive the math from documented
semantics), this executes the reference code itself, pinning the composite
memory readout: t_pos -> ``maskmem_tpos_enc`` index mapping
(``sam2_base.py:577-579``), the ``0.1 * curr_pos`` input mix
(``memory_attention.py:140-141``), obj-ptr token splitting
(``sam2_base.py:582-635``), stride-r non-cond selection, multi-cond-frame
attention, and occlusion/no-obj arithmetic (``sam2_base.py:354-400``).

The reference package is loaded via a stub parent module (its real
``__init__.py`` needs hydra, which isn't installed); the fork's required
``cell_nums`` decoder arg (which breaks the video path in the snapshot,
``mask_decoder.py:118``) is defaulted to None at test time.

Config notes: the fork hardcodes ``image_size = 256`` (``sam2_base.py:160``)
and force-resizes dense prompt embeddings to 16x16 (``prompt_encoder.py:190``)
— both are identities at image_size=256, so the differential model runs at
256 px with tiny channel dims.
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from medsam2_tpu.configs import (
    SAM2Config, HieraConfig, FpnNeckConfig, MemoryAttentionConfig, MemoryEncoderConfig,
)
from medsam2_tpu.checkpoint.convert import export_state_dict
from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.api.video_predictor import SAM2VideoPredictor
from medsam2_tpu.utils.transforms import IMAGENET_MEAN, IMAGENET_STD


# ---------------------------------------------------------------------------
# Reference loading
# ---------------------------------------------------------------------------

REF_ROOT = "/root/reference/sam2_train"


def _load_reference_modeling():
    """Import ``sam2_train.modeling.*`` from /root/reference without executing
    the top-level ``sam2_train/__init__.py`` (which requires hydra)."""
    if "sam2_train" not in sys.modules:
        pkg = types.ModuleType("sam2_train")
        pkg.__path__ = [REF_ROOT]
        sys.modules["sam2_train"] = pkg
    import importlib

    mods = {}
    for name in (
        "sam2_train.modeling.sam2_base",
        "sam2_train.modeling.backbones.hieradet",
        "sam2_train.modeling.backbones.image_encoder",
        "sam2_train.modeling.memory_attention",
        "sam2_train.modeling.memory_encoder",
        "sam2_train.modeling.position_encoding",
        "sam2_train.modeling.sam.transformer",
    ):
        mods[name.rsplit(".", 1)[-1]] = importlib.import_module(name)
    return mods


def make_diff_config(**overrides) -> SAM2Config:
    base = dict(
        # global block 2 sits mid-stage-2 (the reference's Hiera can't pool and
        # go global in the same block, hieradet.py:150-163)
        trunk=HieraConfig(embed_dim=8, stages=(1, 2, 1, 1), window_spec=(4, 4, 4, 4),
                          global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(3, 3)),
        neck=FpnNeckConfig(d_model=64, backbone_channel_list=(64, 32, 16, 8),
                           num_pos_feats=64),
        memory_attention=MemoryAttentionConfig(
            d_model=64, num_layers=2, dim_feedforward=128, kv_in_dim=16,
            rope_feat_sizes=(16, 16)),
        memory_encoder=MemoryEncoderConfig(out_dim=16, in_dim=64, num_pos_feats=16),
        image_size=256,
        compute_dtype="float32",
        max_prompt_points=2,
        memory_temporal_stride_for_eval=2,
        binarize_mask_from_pts_for_mem_enc=True,  # the video eval override
    )
    base.update(overrides)
    return SAM2Config(**base)


def build_reference_model(cfg: SAM2Config, predictor: bool = False,
                          **predictor_kwargs):
    """Instantiate the reference SAM2Base with the tiny differential config
    (mirroring the hydra wiring of ``sam2_hiera_t.yaml`` at small dims).
    ``predictor=True`` builds the reference's full ``SAM2VideoPredictor``
    (dict-state machine included) instead of the bare base model."""
    m = _load_reference_modeling()
    hiera = m["hieradet"].Hiera(
        embed_dim=cfg.trunk.embed_dim,
        num_heads=cfg.trunk.num_heads,
        stages=list(cfg.trunk.stages),
        global_att_blocks=list(cfg.trunk.global_att_blocks),
        window_pos_embed_bkg_spatial_size=list(cfg.trunk.window_pos_embed_bkg_spatial_size),
        window_spec=list(cfg.trunk.window_spec),
    )
    pe_sine = m["position_encoding"].PositionEmbeddingSine
    neck = m["image_encoder"].FpnNeck(
        position_encoding=pe_sine(num_pos_feats=cfg.neck.num_pos_feats, normalize=True,
                                  scale=None, temperature=10000),
        d_model=cfg.neck.d_model,
        backbone_channel_list=list(cfg.neck.backbone_channel_list),
        fpn_top_down_levels=list(cfg.neck.fpn_top_down_levels),
        fpn_interp_model=cfg.neck.fpn_interp_model,
    )
    image_encoder = m["image_encoder"].ImageEncoder(trunk=hiera, neck=neck, scalp=cfg.scalp)

    mac = cfg.memory_attention
    rope = m["transformer"].RoPEAttention
    layer = m["memory_attention"].MemoryAttentionLayer(
        activation=mac.activation,
        dim_feedforward=mac.dim_feedforward,
        dropout=mac.dropout,
        pos_enc_at_attn=mac.pos_enc_at_attn,
        self_attention=rope(rope_theta=mac.rope_theta, feat_sizes=list(mac.rope_feat_sizes),
                            embedding_dim=mac.d_model, num_heads=mac.self_attn_num_heads,
                            downsample_rate=1, dropout=mac.dropout),
        d_model=mac.d_model,
        pos_enc_at_cross_attn_keys=mac.pos_enc_at_cross_attn_keys,
        pos_enc_at_cross_attn_queries=mac.pos_enc_at_cross_attn_queries,
        cross_attention=rope(rope_theta=mac.rope_theta, feat_sizes=list(mac.rope_feat_sizes),
                             rope_k_repeat=True, embedding_dim=mac.d_model,
                             num_heads=mac.cross_attn_num_heads, downsample_rate=1,
                             dropout=mac.dropout, kv_in_dim=mac.kv_in_dim),
    )
    memory_attention = m["memory_attention"].MemoryAttention(
        d_model=mac.d_model, pos_enc_at_input=mac.pos_enc_at_input, layer=layer,
        num_layers=mac.num_layers)

    mec = cfg.memory_encoder
    memory_encoder = m["memory_encoder"].MemoryEncoder(
        out_dim=mec.out_dim,
        position_encoding=pe_sine(num_pos_feats=mec.num_pos_feats, normalize=True,
                                  scale=None, temperature=10000),
        mask_downsampler=m["memory_encoder"].MaskDownSampler(
            embed_dim=mec.in_dim, kernel_size=mec.mask_downsampler_kernel,
            stride=mec.mask_downsampler_stride, padding=mec.mask_downsampler_padding,
            total_stride=mec.mask_downsampler_total_stride),
        fuser=m["memory_encoder"].Fuser(
            layer=m["memory_encoder"].CXBlock(
                dim=mec.in_dim, kernel_size=mec.fuser_kernel_size,
                padding=mec.fuser_padding,
                layer_scale_init_value=mec.fuser_layer_scale_init, use_dwconv=True),
            num_layers=mec.fuser_num_layers),
        in_dim=mec.in_dim,
    )

    if predictor:
        import importlib

        vp_mod = importlib.import_module("sam2_train.sam2_video_predictor")
        model_cls = vp_mod.SAM2VideoPredictor
    else:
        model_cls = m["sam2_base"].SAM2Base
    model = model_cls(
        **predictor_kwargs,
        image_encoder=image_encoder,
        memory_attention=memory_attention,
        memory_encoder=memory_encoder,
        num_maskmem=cfg.num_maskmem,
        image_size=cfg.image_size,  # the fork hardcodes 256 regardless
        backbone_stride=cfg.backbone_stride,
        sigmoid_scale_for_mem_enc=cfg.sigmoid_scale_for_mem_enc,
        sigmoid_bias_for_mem_enc=cfg.sigmoid_bias_for_mem_enc,
        binarize_mask_from_pts_for_mem_enc=cfg.binarize_mask_from_pts_for_mem_enc,
        use_mask_input_as_output_without_sam=cfg.use_mask_input_as_output_without_sam,
        directly_add_no_mem_embed=cfg.directly_add_no_mem_embed,
        use_high_res_features_in_sam=cfg.use_high_res_features_in_sam,
        multimask_output_in_sam=cfg.multimask_output_in_sam,
        multimask_min_pt_num=cfg.multimask_min_pt_num,
        multimask_max_pt_num=cfg.multimask_max_pt_num,
        multimask_output_for_tracking=cfg.multimask_output_for_tracking,
        use_multimask_token_for_obj_ptr=cfg.use_multimask_token_for_obj_ptr,
        iou_prediction_use_sigmoid=cfg.iou_prediction_use_sigmoid,
        memory_temporal_stride_for_eval=cfg.memory_temporal_stride_for_eval,
        use_obj_ptrs_in_encoder=cfg.use_obj_ptrs_in_encoder,
        max_obj_ptrs_in_encoder=cfg.max_obj_ptrs_in_encoder,
        add_tpos_enc_to_obj_ptrs=cfg.add_tpos_enc_to_obj_ptrs,
        proj_tpos_enc_in_obj_ptrs=cfg.proj_tpos_enc_in_obj_ptrs,
        only_obj_ptrs_in_the_past_for_eval=cfg.only_obj_ptrs_in_the_past_for_eval,
        pred_obj_scores=cfg.pred_obj_scores,
        pred_obj_scores_mlp=cfg.pred_obj_scores_mlp,
        fixed_no_obj_ptr=cfg.fixed_no_obj_ptr,
        use_mlp_for_obj_ptr_proj=cfg.use_mlp_for_obj_ptr_proj,
        sam_mask_decoder_extra_args=dict(
            # the reference's eval-time overrides (build_sam.py:51-60)
            dynamic_multimask_via_stability=True,
            dynamic_multimask_stability_delta=0.05,
            dynamic_multimask_stability_thresh=0.98,
        ),
        compile_image_encoder=False,
    )
    # The fork made `cell_nums` a required decoder arg but the inherited video
    # path never passes it (snapshot bug, SURVEY.md §0); default it to None so
    # the reference's own video path runs.
    import functools

    model.sam_mask_decoder.forward = functools.partial(
        model.sam_mask_decoder.forward, cell_nums=None)
    model.eval()
    return model


def load_shared_weights(model, params, cfg):
    sd = export_state_dict(params, cfg)
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(torch_sd, strict=True)
    assert not missing and not unexpected


# ---------------------------------------------------------------------------
# Reference driving loop (mirrors SAM2VideoPredictor's preflight + propagation)
# ---------------------------------------------------------------------------


def ref_propagate(model, video01, prompts, frame_order, cond_frames, num_frames):
    """video01: [T, 3, S, S] float in [0,1]; prompts: {frame: (coords [B,P,2],
    labels [B,P])} in model pixels. Returns (masks [T, B, 1, S/4, S/4],
    obj_ptrs {frame: [B, C]})."""
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    B = next(iter(prompts.values()))[1].shape[0]

    def get_feats(f):
        img = (torch.from_numpy(video01[f : f + 1]) - mean) / std
        backbone_out = model.forward_image(img)
        # expand per object, like _get_image_feature (sam2_video_predictor.py:1270-1300)
        expanded = {
            "backbone_fpn": [x.expand(B, -1, -1, -1) for x in backbone_out["backbone_fpn"]],
            "vision_pos_enc": [x.expand(B, -1, -1, -1) for x in backbone_out["vision_pos_enc"]],
        }
        _, feats, pos, sizes = model._prepare_backbone_features(expanded)
        return feats, pos, sizes

    output_dict = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
    results = {}
    # the reference hardcodes `.cuda()` on memory gathers (sam2_base.py:571-576);
    # make it a no-op on this CPU-only torch
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        return _ref_propagate_inner(model, prompts, frame_order, cond_frames,
                                    num_frames, get_feats, output_dict, results)
    finally:
        torch.Tensor.cuda = orig_cuda


def _ref_propagate_inner(model, prompts, frame_order, cond_frames, num_frames,
                         get_feats, output_dict, results):
    with torch.no_grad():
        for f in cond_frames:
            feats, pos, sizes = get_feats(f)
            prompt = prompts[f]
            if prompt[0] == "mask":
                point_inputs = None
                mask_inputs = torch.from_numpy(prompt[1])[:, None].float()
            else:
                coords, labels = prompt[1], prompt[2]
                point_inputs = {"point_coords": torch.from_numpy(coords),
                                "point_labels": torch.from_numpy(labels)}
                mask_inputs = None
            out = model.track_step(
                frame_idx=f, is_init_cond_frame=True,
                current_vision_feats=feats, current_vision_pos_embeds=pos,
                feat_sizes=sizes,
                point_inputs=point_inputs,
                mask_inputs=mask_inputs, output_dict=output_dict,
                num_frames=num_frames, run_mem_encoder=True)
            output_dict["cond_frame_outputs"][f] = out
            results[f] = out
        for f in frame_order:
            if f in cond_frames:
                continue
            feats, pos, sizes = get_feats(f)
            out = model.track_step(
                frame_idx=f, is_init_cond_frame=False,
                current_vision_feats=feats, current_vision_pos_embeds=pos,
                feat_sizes=sizes, point_inputs=None, mask_inputs=None,
                output_dict=output_dict, num_frames=num_frames,
                run_mem_encoder=True)
            output_dict["non_cond_frame_outputs"][f] = out
            results[f] = out
    masks = np.stack([results[f]["pred_masks"].numpy() for f in frame_order])
    ptrs = {f: results[f]["obj_ptr"].numpy() for f in frame_order}
    return masks, ptrs


def make_video(T=8, S=256, seed=0):
    """Smooth synthetic video: a moving bright square + moving dim disc on a
    noisy background, in [0,1]."""
    rng = np.random.default_rng(seed)
    base = rng.random((S // 16, S // 16, 3)).astype(np.float32)
    bg = np.asarray(jax.image.resize(jnp.asarray(base), (S, S, 3), "linear")) * 0.3
    video = np.zeros((T, 3, S, S), np.float32)
    yy, xx = np.mgrid[0:S, 0:S]
    for t in range(T):
        img = bg.copy()
        x0 = 40 + 12 * t
        img[80:150, x0:x0 + 70] = np.array([0.9, 0.8, 0.2], np.float32)
        cy, cx = 190, 60 + 10 * t
        disc = (yy - cy) ** 2 + (xx - cx) ** 2 < 30 ** 2
        img[disc] = np.array([0.2, 0.5, 0.9], np.float32)
        video[t] = img.transpose(2, 0, 1)
    return np.clip(video, 0, 1)


def default_prompts(cfg, cond_frames):
    # 2 objects, 2 points each
    prompts = {}
    for f in cond_frames:
        sq_x = 40 + 12 * f + 35
        dc_x = 60 + 10 * f
        coords = np.array([
            [[sq_x, 115], [sq_x + 10, 120]],      # obj 0: 2 positive clicks on square
            [[dc_x, 190], [sq_x, 115]],           # obj 1: disc click + negative on square
        ], np.float32)
        labels = np.array([[1, 1], [1, 0]], np.int32)
        prompts[f] = ("points", coords, labels)
    return prompts


def run_differential(cfg, seed=0, tol=2e-3, prompts=None, cond_frames=(0, 3),
                     T=8):
    video = make_video(T=T, S=cfg.image_size, seed=seed)
    params = sam2_init(jax.random.PRNGKey(seed), cfg)

    ref = build_reference_model(cfg)
    load_shared_weights(ref, params, cfg)

    cond_frames = list(cond_frames)
    if prompts is None:
        prompts = default_prompts(cfg, cond_frames)

    frame_order = list(range(T))
    ref_masks, ref_ptrs = ref_propagate(ref, video, prompts, frame_order,
                                        cond_frames, num_frames=T)

    pred = SAM2VideoPredictor(params, cfg, fill_hole_area=0, non_overlap_masks=False)
    state = pred.val_init_state(video)  # [T, 3, S, S] in [0,1]
    for f in cond_frames:
        prompt = prompts[f]
        if prompt[0] == "mask":
            for o in range(prompt[1].shape[0]):
                pred.add_new_mask(state, f, o, prompt[1][o])
        else:
            coords, labels = prompt[1], prompt[2]
            for o in range(coords.shape[0]):
                pred.add_new_points(state, f, o, coords[o], labels[o],
                                    normalize_coords=False)
    order, masks = pred.propagate_in_video_batch(state)
    assert order == frame_order
    my_masks = np.asarray(masks, np.float32)

    err = np.abs(my_masks - ref_masks)
    scale = np.maximum(np.abs(ref_masks), 1.0)
    rel = err / scale
    assert ref_masks.std() > 0.01  # sanity: outputs aren't degenerate
    assert rel.max() < tol, (
        f"max rel err {rel.max():.2e} at {np.unravel_index(rel.argmax(), rel.shape)}; "
        f"per-frame max: {rel.reshape(T, -1).max(1)}")
    return my_masks, ref_masks


def test_differential_propagation_stride2():
    """8-frame propagation, 2 cond frames, r=2, 2 objects, against the executed
    reference (``sam2_base.py:494-800``)."""
    cfg = make_diff_config()
    run_differential(cfg)


def test_differential_obj_ptr_tpos_enabled():
    """Flag-on parity for the obj-ptr temporal sine encoding + projection
    (``sam2_base.py:617-634``)."""
    cfg = make_diff_config(add_tpos_enc_to_obj_ptrs=True,
                           proj_tpos_enc_in_obj_ptrs=True,
                           memory_temporal_stride_for_eval=1)
    run_differential(cfg, seed=1)


def test_differential_mask_prompt():
    """Mask-prompt conditioning frames against the executed reference
    (``sam2_base.py:412-462`` ``_use_mask_as_output``, incl. the
    mask-downsample obj-ptr sub-path): frame 0 prompts both objects with
    binary masks, frame 3 with clicks."""
    cfg = make_diff_config()
    S = cfg.image_size
    yy, xx = np.mgrid[0:S, 0:S]
    m = np.zeros((2, S, S), np.float32)
    m[0, 80:150, 40:110] = 1.0                                  # square at t=0
    m[1] = (((yy - 190) ** 2 + (xx - 60) ** 2) < 30 ** 2).astype(np.float32)
    prompts = {0: ("mask", m)}
    prompts[3] = default_prompts(cfg, [3])[3]
    run_differential(cfg, seed=2, prompts=prompts, cond_frames=(0, 3))


def test_differential_bbox_prompt():
    """Bbox prompts (2-corner points labeled 2/3, the box path of
    ``sam2_video_predictor.py:425-451`` / ``prompt_encoder.py``) against the
    executed reference."""
    cfg = make_diff_config()
    prompts = {}
    for f in (0, 3):
        sq_x0 = 40 + 12 * f
        dc_x = 60 + 10 * f
        coords = np.array([
            [[sq_x0, 80], [sq_x0 + 70, 150]],          # obj 0: square bbox
            [[dc_x - 30, 160], [dc_x + 30, 220]],      # obj 1: disc bbox
        ], np.float32)
        labels = np.array([[2, 3], [2, 3]], np.int32)
        prompts[f] = ("points", coords, labels)
    run_differential(cfg, seed=3, prompts=prompts, cond_frames=(0, 3))


def test_differential_single_click_multimask():
    """Single-click prompts: multimask output + best-IoU selection
    (``sam2_base.py:376-383``) and the multimask-token obj-ptr path, against
    the executed reference (eval-time dynamic stability args active)."""
    cfg = make_diff_config()
    prompts = {}
    for f in (0, 3):
        coords = np.array([
            [[40 + 12 * f + 35, 115]],                 # obj 0: 1 click on square
            [[60 + 10 * f, 190]],                      # obj 1: 1 click on disc
        ], np.float32)
        labels = np.array([[1], [1]], np.int32)
        prompts[f] = ("points", coords, labels)
    run_differential(cfg, seed=4, prompts=prompts, cond_frames=(0, 3))


def test_differential_real_hiera_t_widths():
    """One run at real hiera_t widths (embed 96 / d_model 256 / FFN 2048,
    256 px, fp32): dtype/width bugs hide at tiny dims. Single object, 5 frames
    to bound CPU cost; same 2e-3 rel pin."""
    from medsam2_tpu.configs import sam2_hiera_t, MemoryAttentionConfig

    cfg = sam2_hiera_t(
        image_size=256, compute_dtype="float32",
        memory_attention=MemoryAttentionConfig(rope_feat_sizes=(16, 16)),
        binarize_mask_from_pts_for_mem_enc=True,
        max_prompt_points=2)
    coords = np.array([[[75, 115], [85, 120]]], np.float32)
    labels = np.array([[1, 1]], np.int32)
    prompts = {0: ("points", coords, labels)}
    run_differential(cfg, seed=5, prompts=prompts, cond_frames=(0,), T=5)

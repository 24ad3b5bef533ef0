"""End-to-end predictor tests on a tiny config: image predictor prompt flows
and video predictor propagation over a synthetic moving-square video."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config, HieraConfig, FpnNeckConfig
from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.api.image_predictor import SAM2ImagePredictor
from medsam2_tpu.api.video_predictor import SAM2VideoPredictor


TINY = SAM2Config(
    trunk=HieraConfig(embed_dim=8, stages=(1, 1, 1, 1), window_spec=(2, 2, 2, 2),
                      global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(3, 3)),
    neck=FpnNeckConfig(backbone_channel_list=(64, 32, 16, 8)),
    image_size=64,
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def tiny_params():
    return sam2_init(jax.random.PRNGKey(0), TINY)


def moving_square_video(T=6, size=64):
    video = np.zeros((T, size, size, 3), np.float32)
    masks = np.zeros((T, size, size), bool)
    for t in range(T):
        x0 = 8 + 4 * t
        video[t, 20:36, x0:x0 + 16] = 1.0
        masks[t, 20:36, x0:x0 + 16] = True
    return video, masks


def test_image_predictor_point_prompt(tiny_params):
    pred = SAM2ImagePredictor(tiny_params, TINY)
    img = (np.random.default_rng(0).random((100, 120, 3)) * 255).astype(np.uint8)
    pred.set_image(img)
    masks, ious, low = pred.predict(
        point_coords=np.array([[60.0, 50.0]]), point_labels=np.array([1]))
    assert masks.shape == (3, 100, 120)          # multimask at original res
    assert masks.dtype == bool
    assert ious.shape == (3,)
    assert low.shape == (3, 16, 16)               # low-res at image_size/4
    assert np.all((ious >= 0) & (ious <= 1))

    # single-mask output
    m1, i1, l1 = pred.predict(
        point_coords=np.array([[60.0, 50.0]]), point_labels=np.array([1]),
        multimask_output=False)
    assert m1.shape == (1, 100, 120)

    # box prompt
    mb_, ib, lb = pred.predict(box=np.array([10, 10, 80, 80]), multimask_output=False)
    assert mb_.shape == (1, 100, 120)

    # box + point
    mbp, _, _ = pred.predict(
        point_coords=np.array([[60.0, 50.0]]), point_labels=np.array([0]),
        box=np.array([10, 10, 80, 80]))
    assert mbp.shape == (3, 100, 120)

    # mask input (low-res logits from previous round)
    m2, _, _ = pred.predict(
        point_coords=np.array([[60.0, 50.0]]), point_labels=np.array([1]),
        mask_input=l1, multimask_output=False)
    assert m2.shape == (1, 100, 120)


def test_image_predictor_batch(tiny_params):
    pred = SAM2ImagePredictor(tiny_params, TINY)
    imgs = [(np.random.default_rng(i).random((64, 64, 3)) * 255).astype(np.uint8)
            for i in range(2)]
    pred.set_image_batch(imgs)
    masks, ious, lows = pred.predict_batch(
        point_coords_batch=[np.array([[32.0, 32.0]]), np.array([[16.0, 16.0]])],
        point_labels_batch=[np.array([1]), np.array([1])])
    assert len(masks) == 2 and masks[0].shape == (3, 64, 64)


def test_video_predictor_propagation(tiny_params):
    pred = SAM2VideoPredictor(tiny_params, TINY, max_cond_frames=2)
    video, gt = moving_square_video(T=5)
    state = pred.init_state(images=video)
    f, ids, preview = pred.add_new_points(
        state, frame_idx=0, obj_id=1, points=np.array([[16.0, 28.0]]),
        labels=np.array([1]))
    assert f == 0 and ids == [1]
    assert preview.shape == (1, 1, 16, 16)

    frames, masks = pred.propagate_in_video_batch(state)
    assert frames == [0, 1, 2, 3, 4]
    assert masks.shape == (5, 1, 1, 16, 16)
    assert np.all(np.isfinite(np.asarray(masks)))

    # generator API yields video-res masks
    outs = list(pred.propagate_in_video(state))
    assert len(outs) == 5
    f0, ids0, vm = outs[0]
    assert f0 == 0 and ids0 == [1]
    assert vm.shape == (1, 1, 64, 64)


def test_video_predictor_multi_object_mixed_prompts(tiny_params):
    pred = SAM2VideoPredictor(tiny_params, TINY, max_cond_frames=2)
    video, gt = moving_square_video(T=4)
    state = pred.train_init_state(video.transpose(0, 3, 1, 2))  # [T,3,S,S] accepted
    pred.add_new_bbox(state, 0, obj_id=1, bbox=np.array([[8, 20], [24, 36]]))
    pred.add_new_mask(state, 0, obj_id=2, mask=gt[0])
    # prompts on a second frame
    pred.add_new_points(state, 2, obj_id=1, points=np.array([[24.0, 28.0]]),
                        labels=np.array([1]))
    # obj 2 not prompted on frame 2 -> empty-mask fallback path
    frames, masks = pred.propagate_in_video_batch(state)
    assert frames == [0, 1, 2, 3]
    assert masks.shape == (4, 2, 1, 16, 16)
    assert np.all(np.isfinite(np.asarray(masks)))


def test_video_predictor_eval_overrides(tiny_params):
    pred = SAM2VideoPredictor.for_eval(tiny_params, TINY, max_cond_frames=2)
    assert pred.cfg.binarize_mask_from_pts_for_mem_enc
    assert pred.fill_hole_area == 8
    assert pred.non_overlap_masks
    video, _ = moving_square_video(T=3)
    state = pred.init_state(images=video)
    pred.add_new_points(state, 0, obj_id=1, points=np.array([[16.0, 28.0]]),
                        labels=np.array([1]))
    outs = list(pred.propagate_in_video(state))
    assert len(outs) == 3
    assert np.isfinite(np.asarray(outs[-1][2])).all()


def test_video_predictor_long_video_ring_wraparound(tiny_params):
    """Video longer than the non-cond ring: wrap-around lookups must stay
    consistent (stored frame-index matching rejects stale slots)."""
    pred = SAM2VideoPredictor(tiny_params, TINY, max_cond_frames=2)
    T = pred.spec.noncond_ring * 2 + 3  # force multiple wraps
    video, _ = moving_square_video(T=T)
    state = pred.init_state(images=video)
    pred.add_new_points(state, 0, obj_id=1, points=np.array([[16.0, 28.0]]),
                        labels=np.array([1]))
    frames, masks = pred.propagate_in_video_batch(state)
    assert frames == list(range(T))
    assert np.isfinite(np.asarray(masks)).all()


def test_video_predictor_eval_stride(tiny_params):
    """memory_temporal_stride_for_eval r=2: the stride-r readout path runs
    end-to-end (arithmetic itself is oracle-tested in test_memory)."""
    import dataclasses
    cfg2 = dataclasses.replace(TINY, memory_temporal_stride_for_eval=2)
    pred = SAM2VideoPredictor(tiny_params, cfg2, max_cond_frames=2)
    assert pred.spec.temporal_stride == 2
    video, _ = moving_square_video(T=6)
    state = pred.init_state(images=video)
    pred.add_new_points(state, 0, obj_id=1, points=np.array([[16.0, 28.0]]),
                        labels=np.array([1]))
    frames, masks = pred.propagate_in_video_batch(state)
    assert frames == list(range(6))
    assert np.isfinite(np.asarray(masks)).all()


def test_video_predictor_reset_and_reverse(tiny_params):
    pred = SAM2VideoPredictor(tiny_params, TINY, max_cond_frames=2)
    video, _ = moving_square_video(T=4)
    state = pred.init_state(images=video)
    pred.add_new_points(state, 3, obj_id=7, points=np.array([[52.0, 28.0]]),
                        labels=np.array([1]))
    frames, masks = pred.propagate_in_video_batch(state, reverse=True)
    assert frames == [3, 2, 1, 0]
    assert masks.shape == (4, 1, 1, 16, 16)
    pred.reset_state(state)
    assert state["obj_ids"] == []


def test_max_cond_frames_in_attn_caps_bank(tiny_params):
    """configs.max_cond_frames_in_attn bounds the cond slots the bank (and so
    memory attention) pays for, reproducing the reference's top-k closest
    cond-frame cap (sam2_base.py:516-528)."""
    import dataclasses
    from medsam2_tpu.state import memory_bank as mb

    cfg = dataclasses.replace(TINY, max_cond_frames_in_attn=2)
    pred = SAM2VideoPredictor(tiny_params, cfg, max_cond_frames=8)
    video, _ = moving_square_video(T=6)
    state = pred.init_state(images=video)
    for f in (0, 2, 4):
        pred.add_new_points(state, frame_idx=f, obj_id=1,
                            points=np.array([[16.0, 28.0]]),
                            labels=np.array([1]))
    spec = pred._session_spec(state)
    assert spec.max_cond_frames == 2
    assert mb.BankSpec.from_config(cfg, max_cond_frames=8).max_cond_frames == 2
    frames, masks = pred.propagate_in_video_batch(state)
    assert masks.shape[0] == 6


def test_clear_non_cond_mem_flags(tiny_params):
    """Signature parity with sam2_video_predictor.py:20-37: the clear-around-
    input kwargs are accepted and stored; with the flag on, a single-object
    propagation still runs end to end (semantics are pinned reference-side by
    tests/test_video_predictor_differential.py::test_vp_differential_clear_*)."""
    pred = SAM2VideoPredictor(tiny_params, TINY,
                              clear_non_cond_mem_around_input=False,
                              clear_non_cond_mem_for_multi_obj=False)
    assert not pred.clear_non_cond_mem_around_input

    video, _ = moving_square_video(T=6)
    pred = SAM2VideoPredictor(tiny_params, TINY,
                              clear_non_cond_mem_around_input=True)
    assert pred.clear_non_cond_mem_around_input
    state = pred.init_state(images=video)
    pred.add_new_points(state, frame_idx=0, obj_id=1,
                        points=np.array([[32.0, 32.0]]),
                        labels=np.array([1]))
    n = sum(1 for _ in pred.propagate_in_video(state))
    assert n == 6


def test_correction_frames_noncond_vs_cond(tiny_params):
    """add_all_frames_to_correct_as_cond: with the default (False) a prompt on
    an already-tracked frame is processed in preflight but its memory goes to
    the non-cond ring; with True it becomes a conditioning frame
    (sam2_video_predictor.py:292-341)."""
    import dataclasses

    video, _ = moving_square_video(T=6)

    # default False: correction stays non-cond
    pred = SAM2VideoPredictor(tiny_params, TINY, max_cond_frames=2)
    state = pred.init_state(images=video)
    pred.add_new_points(state, frame_idx=0, obj_id=1,
                        points=np.array([[16.0, 28.0]]), labels=np.array([1]))
    frames1, masks1 = pred.propagate_in_video_batch(state)
    pred.add_new_points(state, frame_idx=3, obj_id=1,
                        points=np.array([[28.0, 28.0]]), labels=np.array([1]))
    assert state["cond_frame_idx"] == {0}
    assert state["noncond_prompt_frame_idx"] == {3}
    frames, masks = pred.propagate_in_video_batch(state)
    assert frames == [0, 1, 2, 3, 4, 5]
    assert masks.shape == (6, 1, 1, 16, 16)
    # frames before the correction re-track identically...
    np.testing.assert_allclose(np.asarray(masks[:3]), np.asarray(masks1[:3]),
                               rtol=1e-4, atol=1e-5)
    # ...the corrected frame decodes memory-conditioned with its previous mask
    # logits re-fed (sam2_video_predictor.py:293-399) — NOT the memoryless
    # prompt-step preview, and changed from the uncorrected pass
    _, _, preview = pred._preview(state, 3)
    m3 = np.asarray(masks[3])
    assert np.isfinite(m3).all()
    assert not np.allclose(m3, preview, rtol=1e-3, atol=1e-4)
    assert not np.allclose(m3, np.asarray(masks1[3]), rtol=1e-3, atol=1e-4)

    # True: correction becomes a cond frame
    cfg_cond = dataclasses.replace(TINY, add_all_frames_to_correct_as_cond=True)
    pred2 = SAM2VideoPredictor(tiny_params, cfg_cond, max_cond_frames=2)
    state2 = pred2.init_state(images=video)
    pred2.add_new_points(state2, frame_idx=0, obj_id=1,
                         points=np.array([[16.0, 28.0]]), labels=np.array([1]))
    pred2.propagate_in_video_batch(state2)
    pred2.add_new_points(state2, frame_idx=3, obj_id=1,
                         points=np.array([[28.0, 28.0]]), labels=np.array([1]))
    assert state2["cond_frame_idx"] == {0, 3}
    assert state2["noncond_prompt_frame_idx"] == set()
    frames2, masks2 = pred2.propagate_in_video_batch(state2)
    assert masks2.shape == (6, 1, 1, 16, 16)


def test_correction_memory_survives_ring_clobber(tiny_params):
    """Full re-propagation across a corrected frame restores the correction's
    ring-slot memory even when an earlier frame shares the slot (the segmented
    scan re-writes it; the reference's per-frame dict never collides)."""
    from medsam2_tpu.state import memory_bank as mb

    T = 10
    video, _ = moving_square_video(T=T)
    pred = SAM2VideoPredictor(tiny_params, TINY, max_cond_frames=2)
    state = pred.init_state(images=video)
    pred.add_new_points(state, frame_idx=0, obj_id=1,
                        points=np.array([[16.0, 28.0]]), labels=np.array([1]))
    pred.propagate_in_video_batch(state)
    corr = 8
    spec = pred._session_spec(state)
    assert corr >= spec.noncond_ring  # frame corr-ring shares its slot
    pred.add_new_points(state, frame_idx=corr, obj_id=1,
                        points=np.array([[40.0, 28.0]]), labels=np.array([1]))
    frames, masks = pred.propagate_in_video_batch(state)
    assert frames == list(range(T))
    assert masks.shape == (T, 1, 1, 16, 16)
    assert np.all(np.isfinite(np.asarray(masks)))


def test_kcache_propagation_matches_uncached(tiny_params):
    """The roped-key cache (write-time k projection + RoPE) must not change
    propagation outputs (fp32: tight tolerance — only summation order
    differs)."""
    video, _ = moving_square_video(T=6)
    outs = {}
    for flag in (True, False):
        pred = SAM2VideoPredictor(tiny_params, TINY, max_cond_frames=2,
                                  use_kcache=flag)
        state = pred.init_state(images=video)
        pred.add_new_points(state, frame_idx=0, obj_id=1,
                            points=np.array([[16.0, 28.0]]), labels=np.array([1]))
        pred.add_new_points(state, frame_idx=2, obj_id=1,
                            points=np.array([[24.0, 28.0]]), labels=np.array([1]))
        _, masks = pred.propagate_in_video_batch(state)
        outs[flag] = np.asarray(masks)
    assert outs[True].shape == outs[False].shape
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-3, atol=1e-4)


def test_segmented_propagation_edge_cases(tiny_params):
    """The segmented (branch-free) scan splices stored cond masks correctly
    for: consecutive cond frames, a cond frame mid-video, reverse from a
    mid-video prompt, and max_frame_num_to_track truncation."""
    pred = SAM2VideoPredictor(tiny_params, TINY, max_cond_frames=3)
    video, _ = moving_square_video(T=7)

    # consecutive cond frames 2,3 + cond at 0
    state = pred.init_state(images=video)
    for f in (0, 2, 3):
        pred.add_new_points(state, frame_idx=f, obj_id=1,
                            points=np.array([[16.0 + 4 * f, 28.0]]),
                            labels=np.array([1]))
    frames, masks = pred.propagate_in_video_batch(state)
    assert frames == [0, 1, 2, 3, 4, 5, 6]
    assert masks.shape[0] == 7
    assert np.all(np.isfinite(np.asarray(masks)))
    # the cond-frame rows are exactly the preflight outputs (spliced, not
    # recomputed by the scan)
    for f in (0, 2, 3):
        got = np.asarray(masks[f])
        assert np.all(np.isfinite(got)) and got.shape == (1, 1, 16, 16)

    # reverse from a mid-video prompt: order 4,3,2,1,0
    state2 = pred.init_state(images=video)
    pred.add_new_points(state2, frame_idx=4, obj_id=1,
                        points=np.array([[32.0, 28.0]]), labels=np.array([1]))
    frames_r, masks_r = pred.propagate_in_video_batch(state2, reverse=True)
    assert frames_r == [4, 3, 2, 1, 0]
    assert masks_r.shape[0] == 5

    # truncation (reference semantics: start + max INCLUSIVE,
    # sam2_video_predictor.py:1072-1075 -> 4 frames for max=3)
    state3 = pred.init_state(images=video)
    pred.add_new_points(state3, frame_idx=1, obj_id=1,
                        points=np.array([[20.0, 28.0]]), labels=np.array([1]))
    frames_t, masks_t = pred.propagate_in_video_batch(
        state3, max_frame_num_to_track=3)
    assert frames_t == [1, 2, 3, 4]
    assert masks_t.shape[0] == 4


def test_kv_storage_propagation_parity(tiny_params, monkeypatch):
    """MEDSAM2_KV_STORAGE=1 switches the propagation scan to the storage-order
    kv-cache readout (``sam2_model._memory_conditioned_features_storage``; on
    CPU the Pallas kernel falls back to its XLA assembly). Masks must match
    the default recency-gather ``k_cache`` path, including ring wraps,
    stride-2 readout, and a mid-video correction prompt."""
    import dataclasses
    cfg = dataclasses.replace(TINY, memory_temporal_stride_for_eval=2)
    params = sam2_init(jax.random.PRNGKey(1), cfg)
    T = 10
    video, _ = moving_square_video(T=T)

    def run(kv_storage: bool):
        monkeypatch.setenv("MEDSAM2_KV_STORAGE", "1" if kv_storage else "0")
        pred = SAM2VideoPredictor(params, cfg, max_cond_frames=2)
        state = pred.init_state(images=video)
        pred.add_new_points(state, 0, obj_id=1,
                            points=np.array([[16.0, 28.0]]),
                            labels=np.array([1]))
        pred.add_new_points(state, 5, obj_id=1,
                            points=np.array([[36.0, 28.0]]),
                            labels=np.array([1]))
        frames, masks = pred.propagate_in_video_batch(state)
        assert frames == list(range(T))
        return np.asarray(masks)

    base = run(False)
    storage = run(True)
    np.testing.assert_allclose(storage, base, rtol=2e-4, atol=2e-5)


def test_kv_storage_reverse_parity(tiny_params, monkeypatch):
    """Reverse propagation through the storage-order readout: the
    target-frame/validity arithmetic of kv_storage_layout flips with
    track_in_reverse, so pin it against the default path too."""
    T = 7
    video, _ = moving_square_video(T=T)

    def run(kv: str):
        monkeypatch.setenv("MEDSAM2_KV_STORAGE", kv)
        pred = SAM2VideoPredictor(tiny_params, TINY, max_cond_frames=2)
        state = pred.init_state(images=video)
        pred.add_new_points(state, T - 1, obj_id=1,
                            points=np.array([[40.0, 28.0]]),
                            labels=np.array([1]))
        frames, masks = pred.propagate_in_video_batch(state, reverse=True)
        assert frames == list(range(T - 1, -1, -1))
        return np.asarray(masks)

    np.testing.assert_allclose(run("1"), run("0"), rtol=2e-4, atol=2e-5)


def test_kv_storage_obj_ptr_tpos_parity(tiny_params, monkeypatch):
    """Storage-order readout with the obj-ptr temporal sine encoding enabled
    (add_tpos_enc_to_obj_ptrs + proj_tpos_enc_in_obj_ptrs, the sam2.1 flags):
    the ptr positional branch of _memory_conditioned_features_storage must
    match the default path."""
    import dataclasses
    from medsam2_tpu.core.sam2_model import sam2_init as init_fn

    cfg = dataclasses.replace(TINY, add_tpos_enc_to_obj_ptrs=True,
                              proj_tpos_enc_in_obj_ptrs=True)
    params = init_fn(jax.random.PRNGKey(2), cfg)
    T = 6
    video, _ = moving_square_video(T=T)

    def run(kv: str):
        monkeypatch.setenv("MEDSAM2_KV_STORAGE", kv)
        pred = SAM2VideoPredictor(params, cfg, max_cond_frames=2)
        state = pred.init_state(images=video)
        pred.add_new_points(state, 0, obj_id=1,
                            points=np.array([[16.0, 28.0]]),
                            labels=np.array([1]))
        _, masks = pred.propagate_in_video_batch(state)
        return np.asarray(masks)

    np.testing.assert_allclose(run("1"), run("0"), rtol=2e-4, atol=2e-5)

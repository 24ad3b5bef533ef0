"""Differential predictor oracle: execute the *reference's own*
``SAM2VideoPredictor`` (``/root/reference/sam2_train/sam2_video_predictor.py``)
end to end on CPU torch with shared weights and assert our predictor emits the
same per-frame video-resolution masks.

The module-level differential (``test_reference_differential.py``) drives the
reference's ``track_step`` with a hand-mirrored loop; this one executes the
reference's dict-state machine itself, pinning what that mirror can't:

- per-object temp-output slicing + consolidation across objects when objects
  are prompted on *different* frames (NO_OBJ_SCORE placeholder masks and
  empty-mask dummy pointers, ``sam2_video_predictor.py:746-897``),
- preflight memory encoding of consolidated prompt frames with
  ``is_mask_from_pts=True`` for every object (``:852-860``),
- ``frames_already_tracked`` bookkeeping and the propagation windowing
  contract: both directions span ``max_frame_num_to_track + 1`` frames
  inclusive of the start frame, and reverse from frame 0 yields nothing
  (``:1063-1079``),
- the ``add_new_points/add_new_bbox/add_new_mask`` input plumbing (coordinate
  normalization, bbox -> 2/3-labeled corners, mask resize-binarize) and the
  video-res output resize (``:726-746``).

The reference predictor hardcodes cuda in a few places
(``torch.device("cuda")`` in init_state, ``.cuda()`` on gathers); the fixture
installs a module-local torch proxy mapping cuda -> cpu and an identity
``Tensor.cuda`` so the reference's own code runs unmodified on CPU.
"""

import pytest

pytestmark = pytest.mark.slow  # executed-reference differential: heavy CPU compiles, run in the separate `-m slow` lane

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")

from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.api.video_predictor import SAM2VideoPredictor

from tests.test_reference_differential import (
    make_diff_config,
    build_reference_model,
    load_shared_weights,
    make_video,
)


class _TorchCPUProxy:
    """Stand-in for the ``torch`` module global inside the reference
    predictor: identical, except ``torch.device('cuda')`` resolves to cpu."""

    def __init__(self, real):
        object.__setattr__(self, "_real", real)

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "_real"), name)

    def device(self, *args, **kwargs):
        real = object.__getattribute__(self, "_real")
        if args and isinstance(args[0], str) and args[0].startswith("cuda"):
            return real.device("cpu")
        return real.device(*args, **kwargs)


@pytest.fixture(scope="module")
def shared():
    cfg = make_diff_config()
    params = sam2_init(jax.random.PRNGKey(0), cfg)
    ref = build_reference_model(cfg, predictor=True, fill_hole_area=0,
                                non_overlap_masks=False)
    load_shared_weights(ref, params, cfg)
    ours = SAM2VideoPredictor(params, cfg, fill_hole_area=0,
                              non_overlap_masks=False)

    import sam2_train.sam2_video_predictor as vp_mod

    orig_torch = vp_mod.torch
    orig_cuda = torch.Tensor.cuda
    vp_mod.torch = _TorchCPUProxy(torch)
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield cfg, ref, ours
    finally:
        vp_mod.torch = orig_torch
        torch.Tensor.cuda = orig_cuda


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------


def _apply_script(pred, state, script, *, is_ref: bool):
    """script: list of (kind, frame, obj_id, data); data is (coords [P,2],
    labels [P]) for points, [2, 2] corner array for bbox, [H, W] bool mask."""
    for kind, frame, obj, data in script:
        if kind == "points":
            coords, labels = data
            if is_ref:
                pred.add_new_points(state, frame, obj,
                                    torch.tensor(np.asarray(coords, np.float32)),
                                    torch.tensor(np.asarray(labels, np.int32)))
            else:
                pred.add_new_points(state, frame, obj, coords, labels)
        elif kind == "bbox":
            arr = np.asarray(data, np.float32)
            if is_ref:
                pred.add_new_bbox(state, frame, obj, torch.tensor(arr))
            else:
                pred.add_new_bbox(state, frame, obj, arr)
        elif kind == "mask":
            m = np.asarray(data)
            if is_ref:
                pred.add_new_mask(state, frame, obj, torch.from_numpy(m))
            else:
                pred.add_new_mask(state, frame, obj, m.astype(np.float32))
        else:  # pragma: no cover
            raise ValueError(kind)


def run_reference(ref, video01, script, **propagate_kwargs):
    # reference val_init_state divides by 255 before imagenet-normalizing
    state = ref.val_init_state(torch.from_numpy(video01 * 255.0))
    _apply_script(ref, state, script, is_ref=True)
    out = {}
    for f, _obj_ids, masks in ref.propagate_in_video(state, **propagate_kwargs):
        out[f] = masks.clone().float().numpy()
    return out


def run_ours(ours, video01, script, **propagate_kwargs):
    state = ours.val_init_state(video01)  # [T, 3, S, S] in [0, 1]
    _apply_script(ours, state, script, is_ref=False)
    out = {}
    for f, _obj_ids, masks in ours.propagate_in_video(state, **propagate_kwargs):
        out[f] = np.asarray(masks, np.float32)
    return out


def compare(ref_out, our_out, script, tol=2e-3):
    assert set(ref_out) == set(our_out), (sorted(ref_out), sorted(our_out))
    prompted = {}
    for _kind, frame, obj, _data in script:
        prompted.setdefault(frame, set()).add(obj)
    for f in sorted(ref_out):
        r, o = ref_out[f], our_out[f]
        assert r.shape == o.shape, (f, r.shape, o.shape)
        for obj in range(r.shape[0]):
            if (f in prompted and obj not in prompted[f]
                    and r[obj].max() <= -1000.0):
                # object with no prompt AND no previous output on an
                # interacted frame: the reference stores a NO_OBJ_SCORE
                # (-1024) placeholder; ours decodes an empty mask. The logit
                # values differ by construction; both must be everywhere-
                # negative (empty object). (An unprompted object with a prior
                # tracked output falls back to that output in both
                # implementations and takes the full comparison below.)
                assert o[obj].max() < 0, (f, obj)
                continue
            rel = np.abs(r[obj] - o[obj]) / np.maximum(np.abs(r[obj]), 1.0)
            assert rel.max() < tol, (
                f"frame {f} obj {obj}: max rel err {rel.max():.2e}")
    # sanity: the compared outputs aren't degenerate
    flat = np.concatenate([m.ravel() for m in ref_out.values()])
    assert flat.std() > 0.01


def run_case(shared, script, T=6, seed=0, **propagate_kwargs):
    cfg, ref, ours = shared
    video = make_video(T=T, S=cfg.image_size, seed=seed)
    ref_out = run_reference(ref, video, script, **propagate_kwargs)
    our_out = run_ours(ours, video, script, **propagate_kwargs)
    compare(ref_out, our_out, script)
    return ref_out, our_out


# ---------------------------------------------------------------------------
# cases
# ---------------------------------------------------------------------------


def _sq_click(f):
    """Two clicks on the moving square of make_video at frame f."""
    x = 40 + 12 * f + 35
    return (np.array([[x, 115], [x + 10, 120]], np.float32),
            np.array([1, 1], np.int32))


def _disc_click(f):
    """Positive click on the moving disc + negative on the square."""
    return (np.array([[60 + 10 * f, 190], [40 + 12 * f + 35, 115]], np.float32),
            np.array([1, 0], np.int32))


def test_vp_differential_objects_on_different_frames(shared):
    """obj 0 prompted at frame 0, obj 1 at frame 2: executes the reference's
    cross-object consolidation with a missing object on both prompt frames
    (placeholder masks + empty-mask dummy obj_ptr, run through the memory
    encoder with is_mask_from_pts=True)."""
    script = [("points", 0, 0, _sq_click(0)),
              ("points", 2, 1, _disc_click(2))]
    run_case(shared, script, T=6)


def test_vp_differential_reverse_window(shared):
    """Reverse propagation with a binding max_frame_num_to_track: the window
    spans max+1 frames inclusive (sam2_video_predictor.py:1069-1074)."""
    script = [("points", 4, 0, _sq_click(4)),
              ("points", 4, 1, _disc_click(4))]
    ref_out, _ = run_case(shared, script, T=6, reverse=True,
                          max_frame_num_to_track=2)
    assert sorted(ref_out) == [2, 3, 4]


def test_vp_differential_reverse_from_frame0_is_empty(shared):
    """Reverse from frame 0 yields nothing (sam2_video_predictor.py:1071-1074)."""
    cfg, ref, ours = shared
    video = make_video(T=3, S=cfg.image_size, seed=0)
    script = [("points", 0, 0, _sq_click(0))]
    assert run_reference(ref, video, script, reverse=True) == {}
    assert run_ours(ours, video, script, reverse=True) == {}


def test_vp_differential_forward_window(shared):
    """Forward max_frame_num_to_track also spans max+1 frames inclusive."""
    script = [("points", 1, 0, _sq_click(1)),
              ("points", 1, 1, _disc_click(1))]
    ref_out, _ = run_case(shared, script, T=6, max_frame_num_to_track=2)
    assert sorted(ref_out) == [1, 2, 3]


def test_vp_differential_mask_prompt(shared):
    """add_new_mask: binary mask prompt conditioning (mask stored at model
    res, routed through use_mask_input_as_output_without_sam)."""
    cfg, _, _ = shared
    S = cfg.image_size
    yy, xx = np.mgrid[0:S, 0:S]
    sq = (yy >= 80) & (yy < 150) & (xx >= 75) & (xx < 145)
    script = [("mask", 0, 0, sq), ("points", 0, 1, _disc_click(0))]
    run_case(shared, script, T=5)


def test_vp_differential_bbox_prompt(shared):
    """add_new_bbox: box -> two corner points labeled 2/3."""
    script = [("bbox", 0, 0, np.array([[75.0, 80.0], [145.0, 150.0]])),
              ("bbox", 0, 1, np.array([[30.0, 160.0], [90.0, 220.0]]))]
    run_case(shared, script, T=5)


def test_vp_differential_resume_window(shared):
    """Two-stage propagation: track a window, then resume from its end with
    start_frame_idx — the resumed frames must read the previous round's
    memories (the reference's persistent output_dict keeps them,
    sam2_video_predictor.py:1100-1110; ours re-encodes the ring window of
    preceding frames from their stored outputs)."""
    cfg, ref, ours = shared
    T = 6
    video = make_video(T=T, S=cfg.image_size, seed=0)
    script = [("points", 0, 0, _sq_click(0)),
              ("points", 0, 1, _disc_click(0))]
    ref_state = ref.val_init_state(torch.from_numpy(video * 255.0))
    _apply_script(ref, ref_state, script, is_ref=True)
    ref_out1 = {f: m.clone().float().numpy() for f, _, m in
                ref.propagate_in_video(ref_state, max_frame_num_to_track=2)}
    ref_out2 = {f: m.clone().float().numpy() for f, _, m in
                ref.propagate_in_video(ref_state, start_frame_idx=3)}
    our_state = ours.val_init_state(video)
    _apply_script(ours, our_state, script, is_ref=False)
    our_out1 = {f: np.asarray(m, np.float32) for f, _, m in
                ours.propagate_in_video(our_state, max_frame_num_to_track=2)}
    our_out2 = {f: np.asarray(m, np.float32) for f, _, m in
                ours.propagate_in_video(our_state, start_frame_idx=3)}
    assert sorted(ref_out1) == [0, 1, 2] and sorted(ref_out2) == [3, 4, 5]
    compare(ref_out1, our_out1, script)
    compare(ref_out2, our_out2, script)


def test_vp_differential_correction_click(shared):
    """Correction click on an already-tracked frame, then re-propagation:
    the corrected frame decodes memory-conditioned with the previous mask
    logits (clamped +/-32) re-fed as a mask prompt, its consolidated output
    is re-encoded into non-cond memory, and downstream frames re-track
    against it (sam2_video_predictor.py:293-399 + preflight :901-970)."""
    cfg, ref, ours = shared
    T = 6
    video = make_video(T=T, S=cfg.image_size, seed=0)
    script = [("points", 0, 0, _sq_click(0)),
              ("points", 0, 1, _disc_click(0))]
    # pass 1: prompt + propagate on both (fills tracked-frame records)
    ref_state = ref.val_init_state(torch.from_numpy(video * 255.0))
    _apply_script(ref, ref_state, script, is_ref=True)
    for _ in ref.propagate_in_video(ref_state):
        pass
    our_state = ours.val_init_state(video)
    _apply_script(ours, our_state, script, is_ref=False)
    for _ in ours.propagate_in_video(our_state):
        pass
    # correction: positive + negative click on obj 0 at tracked frame 3
    x = 40 + 12 * 3 + 35
    corr = (np.array([[x, 110.0], [x - 50, 115.0]], np.float32),
            np.array([1, 0], np.int32))
    ref.add_new_points(ref_state, 3, 0, torch.tensor(corr[0]),
                       torch.tensor(corr[1]))
    ours.add_new_points(our_state, 3, 0, corr[0], corr[1])
    # pass 2: re-propagation must agree everywhere (frame 3 via the
    # correction decode, frames 4+ via re-tracking against its memory)
    ref_out = {}
    for f, _ids, m in ref.propagate_in_video(ref_state):
        ref_out[f] = m.clone().float().numpy()
    our_out = {}
    for f, _ids, m in ours.propagate_in_video(our_state):
        our_out[f] = np.asarray(m, np.float32)
    compare(ref_out, our_out, script + [("points", 3, 0, corr)])
    # the correction must actually change frame 3's mask (not a no-op pin)
    assert not np.allclose(ref_out[3][0], ref_out[2][0], atol=1e-3)
    # pass 3 (no new clicks): repeated propagation is idempotent — the
    # reference reuses the consolidated correction decode
    # (consolidated_frame_inds, sam2_video_predictor.py:1086-1096) and so
    # must we, instead of re-applying the clicks on top of pass 2's output
    ref_out3 = {}
    for f, _ids, m in ref.propagate_in_video(ref_state):
        ref_out3[f] = m.clone().float().numpy()
    our_out3 = {}
    for f, _ids, m in ours.propagate_in_video(our_state):
        our_out3[f] = np.asarray(m, np.float32)
    for f in ref_out:
        np.testing.assert_allclose(ref_out3[f], ref_out[f], rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(our_out3[f], our_out[f], rtol=1e-5,
                                   atol=1e-6)
    compare(ref_out3, our_out3, script + [("points", 3, 0, corr)])
    # the uncorrected object keeps its prior tracked output at the corrected
    # frame in both implementations (reference consolidation fallback,
    # sam2_video_predictor.py:797-808; our per-object select) — already
    # covered by compare() on obj 1, but pin the semantics explicitly
    rel = (np.abs(ref_out[3][1] - our_out[3][1])
           / np.maximum(np.abs(ref_out[3][1]), 1.0))
    assert rel.max() < 2e-3


def test_vp_differential_mixed_correction(shared):
    """Correction round mixing prompt kinds on one tracked frame: points on
    obj 0 (memory-conditioned re-decode with prev logits) and a mask on obj 1
    (direct mask-as-output path, use_mask_input_as_output_without_sam — the
    reference's track_step short-circuits memory for mask inputs)."""
    cfg, ref, ours = shared
    T = 5
    S = cfg.image_size
    video = make_video(T=T, S=cfg.image_size, seed=0)
    script = [("points", 0, 0, _sq_click(0)),
              ("points", 0, 1, _disc_click(0))]
    ref_state = ref.val_init_state(torch.from_numpy(video * 255.0))
    _apply_script(ref, ref_state, script, is_ref=True)
    for _ in ref.propagate_in_video(ref_state):
        pass
    our_state = ours.val_init_state(video)
    _apply_script(ours, our_state, script, is_ref=False)
    for _ in ours.propagate_in_video(our_state):
        pass
    f = 2
    x = 40 + 12 * f + 35
    pts = (np.array([[x, 110.0]], np.float32), np.array([1], np.int32))
    yy, xx = np.mgrid[0:S, 0:S]
    cx = 60 + 10 * f
    disc = ((yy - 190) ** 2 + (xx - cx) ** 2) < 34 ** 2
    corrs = [("points", f, 0, pts), ("mask", f, 1, disc)]
    _apply_script(ref, ref_state, corrs, is_ref=True)
    _apply_script(ours, our_state, corrs, is_ref=False)
    ref_out = {fr: m.clone().float().numpy() for fr, _ids, m in
               ref.propagate_in_video(ref_state)}
    our_out = {fr: np.asarray(m, np.float32) for fr, _ids, m in
               ours.propagate_in_video(our_state)}
    compare(ref_out, our_out, script + corrs)


def test_vp_differential_two_corrections_one_round(shared):
    """Two fresh corrections added between propagations: the reference
    decodes each at click time against the PRE-correction output dict
    (add_new_points reads the per-object slice before temp outputs merge),
    so the decodes are mutually independent — ours reconstructs that state
    per correction from the retained outputs."""
    cfg, ref, ours = shared
    T = 6
    video = make_video(T=T, S=cfg.image_size, seed=0)
    script = [("points", 0, 0, _sq_click(0)),
              ("points", 0, 1, _disc_click(0))]
    ref_state = ref.val_init_state(torch.from_numpy(video * 255.0))
    _apply_script(ref, ref_state, script, is_ref=True)
    for _ in ref.propagate_in_video(ref_state):
        pass
    our_state = ours.val_init_state(video)
    _apply_script(ours, our_state, script, is_ref=False)
    for _ in ours.propagate_in_video(our_state):
        pass
    corrs = []
    for f in (2, 4):
        x = 40 + 12 * f + 35
        c = (np.array([[x, 110.0], [x - 50, 115.0]], np.float32),
             np.array([1, 0], np.int32))
        corrs.append(("points", f, 0, c))
        ref.add_new_points(ref_state, f, 0, torch.tensor(c[0]),
                           torch.tensor(c[1]))
        ours.add_new_points(our_state, f, 0, c[0], c[1])
    ref_out = {f: m.clone().float().numpy() for f, _ids, m in
               ref.propagate_in_video(ref_state)}
    our_out = {f: np.asarray(m, np.float32) for f, _ids, m in
               ours.propagate_in_video(our_state)}
    compare(ref_out, our_out, script + corrs)


# ---------------------------------------------------------------------------
# clear_non_cond_mem_around_input (sam2_video_predictor.py:1424-1440)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def shared_clear():
    """Small-memory config (num_maskmem=3, r=1 -> clear window +/-3 frames)
    with ``clear_non_cond_mem_around_input=True`` on both predictors, plus a
    flag-OFF copy of ours to prove the cases are actually discriminating."""
    cfg = make_diff_config(num_maskmem=3, memory_temporal_stride_for_eval=1)
    params = sam2_init(jax.random.PRNGKey(0), cfg)
    ref = build_reference_model(cfg, predictor=True, fill_hole_area=0,
                                non_overlap_masks=False,
                                clear_non_cond_mem_around_input=True)
    load_shared_weights(ref, params, cfg)
    ours = SAM2VideoPredictor(params, cfg, fill_hole_area=0,
                              non_overlap_masks=False,
                              clear_non_cond_mem_around_input=True)
    ours_off = SAM2VideoPredictor(params, cfg, fill_hole_area=0,
                                  non_overlap_masks=False)

    import sam2_train.sam2_video_predictor as vp_mod

    orig_torch = vp_mod.torch
    orig_cuda = torch.Tensor.cuda
    vp_mod.torch = _TorchCPUProxy(torch)
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield cfg, ref, ours, ours_off
    finally:
        vp_mod.torch = orig_torch
        torch.Tensor.cuda = orig_cuda


def test_vp_differential_clear_non_cond_two_cond_frames(shared_clear):
    """Two cond frames, single object, flag on: when forward propagation
    visits the second cond frame (6), the reference pops the non-cond
    memories of frames 3..5 computed earlier in the SAME run
    (sam2_video_predictor.py:1086-1091), so frames 7+ re-track without them
    — ours applies memory_bank.clear_noncond_window at that segment
    boundary."""
    cfg, ref, ours, ours_off = shared_clear
    T = 12
    video = make_video(T=T, S=cfg.image_size, seed=0)
    script = [("points", 0, 0, _sq_click(0)),
              ("points", 6, 0, _sq_click(6))]
    ref_out = run_reference(ref, video, script)
    our_out = run_ours(ours, video, script)
    assert sorted(ref_out) == list(range(T))
    compare(ref_out, our_out, script)
    # the clearing must be load-bearing: flag-off output differs after the
    # second cond frame (it still attends frames 3..5)
    off_out = run_ours(ours_off, video, script)
    post = np.stack([our_out[f] for f in range(7, T)])
    post_off = np.stack([off_out[f] for f in range(7, T)])
    assert not np.allclose(post, post_off, atol=1e-3)


def test_vp_differential_clear_non_cond_resume_after_correction(shared_clear):
    """The VERDICT r3 scenario: full propagation, correction click on tracked
    frame 6, then a start_frame_idx=9 resume. With the flag on, the
    reference's preflight consolidation of the correction pops every non-cond
    output in [3, 9] — including the correction's own (frame 6 is inside its
    own window), so the resumed frames re-track against cond frame 0 and the
    surviving early object pointers only; the retained pre-click memories
    near the correction must NOT be attended. Ours mirrors this with
    retention pops before ring-window reconstruction."""
    import warnings

    cfg, ref, ours, ours_off = shared_clear
    T = 12
    video = make_video(T=T, S=cfg.image_size, seed=0)
    script = [("points", 0, 0, _sq_click(0))]

    x = 40 + 12 * 6 + 35
    corr = (np.array([[x, 110.0], [x - 50, 115.0]], np.float32),
            np.array([1, 0], np.int32))

    ref_state = ref.val_init_state(torch.from_numpy(video * 255.0))
    _apply_script(ref, ref_state, script, is_ref=True)
    for _ in ref.propagate_in_video(ref_state):
        pass
    ref.add_new_points(ref_state, 6, 0, torch.tensor(corr[0]),
                       torch.tensor(corr[1]))
    ref_out = {f: m.clone().float().numpy() for f, _ids, m in
               ref.propagate_in_video(ref_state, start_frame_idx=9)}

    def run_ours_resume(pred):
        st = pred.val_init_state(video)
        _apply_script(pred, st, script, is_ref=False)
        for _ in pred.propagate_in_video(st):
            pass
        pred.add_new_points(st, 6, 0, corr[0], corr[1])
        with warnings.catch_warnings():
            # ours (correctly) warns that the self-popped correction had no
            # effect on the resumed window
            warnings.simplefilter("ignore")
            return {f: np.asarray(m, np.float32) for f, _ids, m in
                    pred.propagate_in_video(st, start_frame_idx=9)}

    our_out = run_ours_resume(ours)
    assert sorted(ref_out) == [9, 10, 11]
    compare(ref_out, our_out, script)
    # flag-off resume attends the retained (stale + corrected) memories of
    # frames 6..8 and must differ
    off_out = run_ours_resume(ours_off)
    on_stack = np.stack([our_out[f] for f in (9, 10, 11)])
    off_stack = np.stack([off_out[f] for f in (9, 10, 11)])
    assert not np.allclose(on_stack, off_stack, atol=1e-3)

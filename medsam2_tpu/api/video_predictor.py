"""SAM2VideoPredictor: video/volume segmentation with memory propagation
(rebuild of ``sam2_train/sam2_video_predictor.py``).

TPU-native redesign: the reference's ``inference_state`` dict-of-dicts state
machine (per-frame Python consolidation, 1-frame feature LRU, CPU offload)
becomes:

- a host-side session object holding the video tensor and recorded prompts,
- a fixed-shape ring-buffer :mod:`~medsam2_tpu.state.memory_bank` carried
  through ``lax.scan`` over frames,
- objects batched along axis 0 (the reference expands features per object,
  ``sam2_video_predictor.py:1270-1300``) so multi-object tracking is one
  batched ``track_step`` per frame,
- prompt ("conditioning") frames processed in a preflight pass that writes
  cond memories (the reference's ``propagate_in_video_preflight`` consolidation,
  ``:900-968``), then one ``lax.scan`` tracks every remaining frame.

API parity: ``init_state`` / ``val_init_state`` / ``train_init_state``,
``add_new_points`` / ``add_new_bbox`` / ``add_new_mask`` (+ ``train_*``
aliases), ``propagate_in_video`` (generator yielding
``(frame_idx, obj_ids, video_res_masks)``), ``reset_state``.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config
from medsam2_tpu.core import layers, sam2_model
from medsam2_tpu.state import memory_bank as mb
from medsam2_tpu.utils.transforms import IMAGENET_MEAN, IMAGENET_STD, SAM2Transforms


def _kv_storage_enabled() -> bool:
    """Gate for the storage-order kv-cache readout in the propagation scan
    (``sam2_model._memory_conditioned_features_storage`` + the Pallas
    ``kv_cached_attention`` kernel). Measured on the real chip (round-3
    driver A/B: 111.5 fps storage-order vs 97.8 read-order @1024, +14%) —
    DEFAULT ON. ``MEDSAM2_KV_STORAGE=0`` opts out (e.g. to reproduce the
    read-order gather path); on CPU / under vmap the kernel falls back to a
    parity-pinned XLA assembly of the same storage layout."""
    return os.environ.get("MEDSAM2_KV_STORAGE", "1") == "1"


class SAM2VideoPredictor:
    def __init__(self, params, cfg: SAM2Config, max_cond_frames: int = 8,
                 fill_hole_area: int = 0, non_overlap_masks: bool = False,
                 use_kcache: bool = True,
                 clear_non_cond_mem_around_input: bool = False,
                 clear_non_cond_mem_for_multi_obj: bool = False):
        # clear_non_cond_mem_around_input (sam2_video_predictor.py:24-36,
        # 1424-1440): when a frame receives new inputs, drop non-cond memories
        # within +/- r*num_maskmem frames of it so later readouts don't mix
        # stale and corrected object appearance. The reference pops entries
        # from its persistent dict at preflight consolidation (:935-940) and
        # whenever propagation visits a cond frame (:1088-1091); here that
        # becomes (a) popping the session's retained outputs around
        # newly-prompted frames at preflight and (b) host-applied validity
        # clears on the ring bank at cond segment boundaries
        # (memory_bank.clear_noncond_window) — only active for single-object
        # sessions unless clear_non_cond_mem_for_multi_obj (:935-937).
        self.clear_non_cond_mem_around_input = clear_non_cond_mem_around_input
        self.clear_non_cond_mem_for_multi_obj = clear_non_cond_mem_for_multi_obj
        self.params = params
        self.cfg = cfg
        self.max_cond_frames = max_cond_frames
        self.fill_hole_area = fill_hole_area
        self.non_overlap_masks = non_overlap_masks
        # roped-key cache: project + RoPE memory keys once at bank-write time
        # instead of per tracked frame (see state/memory_bank.init_bank)
        self.use_kcache = use_kcache and sam2_model.kcache_shape(cfg)[0] > 0
        # Static worst-case spec (kept for callers that size banks up front);
        # propagation uses a session spec sized to the actual prompt count so
        # memory attention never pays kv for unused cond slots (the reference
        # attends exactly the prompted frames, sam2_base.py:518-564).
        self.spec = mb.BankSpec.from_config(cfg, max_cond_frames=max_cond_frames)
        self._transforms = SAM2Transforms(resolution=cfg.image_size)

        self._encode = jax.jit(functools.partial(_encode_frame, cfg=cfg))
        self._prompt_step = jax.jit(
            functools.partial(_prompt_step, cfg=cfg),
            static_argnames=("spec", "multimask_output", "is_eval", "num_frames",
                             "write_cond"),
        )
        self._scan_track = jax.jit(
            functools.partial(_scan_track, cfg=cfg),
            static_argnames=("spec", "is_eval", "num_frames", "track_in_reverse",
                             "return_bank"),
        )
        self._scan_run = jax.jit(
            functools.partial(_scan_track_run, cfg=cfg),
            static_argnames=("spec", "is_eval", "num_frames",
                             "track_in_reverse", "kv_storage", "collect_ptrs"),
        )
        self._corr_step = jax.jit(
            functools.partial(_correction_step, cfg=cfg),
            static_argnames=("spec", "multimask_output", "is_eval",
                             "num_frames", "track_in_reverse", "kv_storage"),
        )
        self._reencode = jax.jit(
            functools.partial(_reencode_correction, cfg=cfg),
            static_argnames=("spec", "is_eval", "mask_from_pts"),
        )

    def _session_spec(self, state) -> mb.BankSpec:
        """Bank spec sized to the session's prompt count (capped at the
        constructor's ``max_cond_frames``); jit caches per distinct size."""
        n = max(1, min(len(state["cond_frame_idx"]), self.max_cond_frames))
        return mb.BankSpec.from_config(self.cfg, max_cond_frames=n)

    def _make_bank(self, spec: mb.BankSpec, B: int):
        if self.use_kcache:
            return mb.init_bank(spec, B,
                                kcache_shape=sam2_model.kcache_shape(self.cfg),
                                kcache_dtype=sam2_model.kcache_dtype(self.cfg))
        return mb.init_bank(spec, B)

    @classmethod
    def for_eval(cls, params, cfg: SAM2Config, **kwargs):
        """Predictor with the reference's eval-time overrides
        (``build_sam.py:51-66``): binarize interacted-frame masks for the
        memory encoder, fill holes up to area 8, apply the cross-object
        non-overlap constraint on outputs."""
        import dataclasses

        eval_cfg = dataclasses.replace(cfg, binarize_mask_from_pts_for_mem_enc=True)
        kwargs.setdefault("fill_hole_area", 8)
        kwargs.setdefault("non_overlap_masks", True)
        return cls(params, eval_cfg, **kwargs)

    # ------------------------------------------------------------------
    # Session init (init_state :39 / val_init_state :107 / train_init_state :179)
    # ------------------------------------------------------------------

    def init_state(self, video_path: Optional[str] = None,
                   images: Optional[np.ndarray] = None,
                   offload_video_to_cpu: bool = False,
                   offload_state_to_cpu: bool = False,
                   async_loading_frames: bool = False) -> Dict:
        """Start a session from a JPEG-frame directory or an image array.

        images: [T, H, W, 3] RGB float/uint8 (video resolution), or
        video_path: directory of ``<idx>.jpg`` frames (``utils/misc.py:163-213``).

        ``async_loading_frames``: decode JPEG frames in a background thread so
        the session starts immediately (the reference's AsyncVideoFrameLoader,
        ``utils/misc.py:104-160``); the video materializes lazily at first use.
        ``offload_video_to_cpu``: keep the video in host memory and transfer it
        per propagation call instead of pinning it in HBM.
        ``offload_state_to_cpu``: keep the retained per-frame outputs (the
        mask logits / pointers that correction clicks decode against) in host
        memory instead of as device slices — one extra device->host transfer
        per propagation, like the reference's storage_device=cpu mode
        (``sam2_video_predictor.py:140-144``). Prompts and the rest of the
        session state are host-side by construction either way.
        """
        loader = None
        if images is None:
            if async_loading_frames:
                loader = _AsyncFrameLoader(video_path, self.cfg.image_size)
                imgs = None
                num_frames = len(loader)
                video_height, video_width = loader.video_height, loader.video_width
            else:
                imgs, video_height, video_width = _load_video_frames_dir(
                    video_path, self.cfg.image_size)
                num_frames = int(imgs.shape[0])
                if offload_video_to_cpu:
                    imgs = np.asarray(imgs)
        else:
            images = np.asarray(images)
            video_height, video_width = images.shape[1], images.shape[2]
            x = images.astype(np.float32)
            # uint8 inputs always scale (an all-dark uint8 video must not skip
            # /255); float inputs fall back to the range heuristic
            if images.dtype == np.uint8 or x.max() > 2.0:
                x = x / 255.0
            imgs = layers.interpolate(
                jnp.asarray(x), (self.cfg.image_size, self.cfg.image_size),
                method="bilinear")
            imgs = (imgs - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            num_frames = int(imgs.shape[0])
            if offload_video_to_cpu:
                imgs = np.asarray(imgs)

        state = {
            "images": imgs,                     # [T, S, S, 3] normalized
            "async_loader": loader,
            "offload_video": bool(offload_video_to_cpu),
            "offload_state": bool(offload_state_to_cpu),
            "num_frames": num_frames,
            "video_height": int(video_height),
            "video_width": int(video_width),
            "obj_id_to_idx": {},
            "obj_ids": [],
            "point_inputs_per_obj": {},         # {obj_idx: {frame: (coords, labels)}}
            "mask_inputs_per_obj": {},          # {obj_idx: {frame: mask [S, S]}}
            "cond_frame_idx": set(),
            # correction prompts on already-tracked frames when
            # add_all_frames_to_correct_as_cond=False: processed in preflight
            # but written to the non-cond ring (sam2_video_predictor.py:292-341)
            "noncond_prompt_frame_idx": set(),
            "tracked": False,
            # per-frame tracking record + retained outputs, mirroring the
            # reference's frames_already_tracked / output_dict: corrections on
            # a tracked frame decode against its previous mask logits and
            # pointers (sam2_video_predictor.py:293-399)
            "frames_tracked": {},           # {frame: reverse bool}
            # retained outputs as (stacked array, row) refs — slicing is
            # deferred to correction time so retention costs no per-frame
            # gather dispatches over the device link
            "last_masks": {},               # {frame: (arr [T,B,1,h4,w4], row)}
            "last_ptrs": {},                # {frame: (arr [T,B,C], row)}
            # correction frames whose decode has been consumed by a previous
            # propagation: later rounds reuse the stored output instead of
            # re-decoding (the reference's consolidated_frame_inds,
            # sam2_video_predictor.py:1086-1096) — new clicks un-consolidate
            "corr_consolidated": set(),
            # frames prompted since the last propagation (the reference's
            # temp_output_dict frame set) — these are the frames the preflight
            # "consolidates", and with clear_non_cond_mem_around_input the
            # frames it clears around (sam2_video_predictor.py:901-940)
            "new_prompt_frames": set(),
            "is_eval": True,
        }
        return state

    def _session_images(self, state):
        """The session video as a device array, materializing the async loader
        and/or transferring a host-offloaded video on demand."""
        if state.get("async_loader") is not None:
            arr = state["async_loader"].wait()
            state["images"] = arr if state.get("offload_video") else jnp.asarray(arr)
            state["async_loader"] = None
        imgs = state["images"]
        return jnp.asarray(imgs) if isinstance(imgs, np.ndarray) else imgs

    def val_init_state(self, imgs_tensor) -> Dict:
        """Session from a preprocessed [T, 3, S, S] or [T, S, S, 3] tensor
        (``val_init_state``, ``sam2_video_predictor.py:107``)."""
        arr = np.asarray(imgs_tensor, np.float32)
        if arr.shape[1] == 3 and arr.ndim == 4:
            arr = arr.transpose(0, 2, 3, 1)
        state = self.init_state(images=arr)
        state["is_eval"] = True
        return state

    def train_init_state(self, imgs_tensor) -> Dict:
        state = self.val_init_state(imgs_tensor)
        state["is_eval"] = False
        return state

    def reset_state(self, state: Dict) -> None:
        state["obj_id_to_idx"] = {}
        state["obj_ids"] = []
        state["point_inputs_per_obj"] = {}
        state["mask_inputs_per_obj"] = {}
        state["cond_frame_idx"] = set()
        state["noncond_prompt_frame_idx"] = set()
        state["tracked"] = False
        state["frames_tracked"] = {}
        state["last_masks"] = {}
        state["last_ptrs"] = {}
        state["corr_consolidated"] = set()
        state["new_prompt_frames"] = set()

    # ------------------------------------------------------------------
    # Prompts (add_new_points :292 / add_new_bbox :425 / add_new_mask :556)
    # ------------------------------------------------------------------

    def _obj_idx(self, state, obj_id):
        if obj_id not in state["obj_id_to_idx"]:
            if state["tracked"]:
                raise RuntimeError(
                    "Cannot add new objects after tracking starts; reset_state first.")
            state["obj_id_to_idx"][obj_id] = len(state["obj_ids"])
            state["obj_ids"].append(obj_id)
            state["point_inputs_per_obj"][state["obj_id_to_idx"][obj_id]] = {}
            state["mask_inputs_per_obj"][state["obj_id_to_idx"][obj_id]] = {}
        return state["obj_id_to_idx"][obj_id]

    def add_new_points(self, state, frame_idx: int, obj_id, points, labels,
                       clear_old_points: bool = True, normalize_coords: bool = True):
        """Record click prompts; returns (frame_idx, obj_ids, low-res masks preview).

        Coordinates are in video-resolution pixels (normalized to model space
        here, as ``sam2_video_predictor.py:292-360`` does).
        """
        obj_idx = self._obj_idx(state, obj_id)
        points = np.asarray(points, np.float32).reshape(-1, 2)
        labels = np.asarray(labels, np.int32).reshape(-1)
        if normalize_coords:
            scale = self.cfg.image_size / np.array(
                [state["video_width"], state["video_height"]], np.float32)
            points = points * scale
        store = state["point_inputs_per_obj"][obj_idx]
        if not clear_old_points and frame_idx in store:
            old_c, old_l = store[frame_idx]
            points = np.concatenate([old_c, points], 0)
            labels = np.concatenate([old_l, labels], 0)
        store[frame_idx] = (points, labels)
        state["mask_inputs_per_obj"][obj_idx].pop(frame_idx, None)
        self._record_prompt_frame(state, frame_idx)
        return self._preview(state, frame_idx)

    def _record_prompt_frame(self, state, frame_idx: int) -> None:
        """Classify a prompted frame as conditioning or not. The reference's
        test is per frame: a prompt on a frame *not yet tracked* is an initial
        conditioning frame even after tracking has started
        (``is_init_cond_frame = frame_idx not in frames_already_tracked``,
        ``sam2_video_predictor.py:292-341``); prompts on tracked frames are
        corrections and go to the non-cond ring unless
        ``add_all_frames_to_correct_as_cond`` is set."""
        # new clicks on a consolidated correction frame re-open it: the next
        # propagation decodes it fresh against the retained (corrected) logits
        state.setdefault("corr_consolidated", set()).discard(frame_idx)
        state.setdefault("new_prompt_frames", set()).add(frame_idx)
        if (frame_idx in state.get("frames_tracked", {})
                and not self.cfg.add_all_frames_to_correct_as_cond
                and frame_idx not in state["cond_frame_idx"]):
            state["noncond_prompt_frame_idx"].add(frame_idx)
        else:
            state["noncond_prompt_frame_idx"].discard(frame_idx)
            state["cond_frame_idx"].add(frame_idx)

    # the reference exposes train_* duplicates without inference_mode; in JAX
    # the same pure functions serve both, so these are aliases
    train_add_new_points = add_new_points

    def add_new_bbox(self, state, frame_idx: int, obj_id, bbox,
                     clear_old_points: bool = True, normalize_coords: bool = True):
        """Box prompt -> two corner points labeled 2/3 (``:425-451``)."""
        bbox = np.asarray(bbox, np.float32).reshape(2, 2)
        return self.add_new_points(
            state, frame_idx, obj_id, bbox, np.array([2, 3], np.int32),
            clear_old_points=clear_old_points, normalize_coords=normalize_coords)

    train_add_new_bbox = add_new_bbox

    def add_new_mask(self, state, frame_idx: int, obj_id, mask):
        """Binary mask prompt at video or model resolution (``:556-...``)."""
        obj_idx = self._obj_idx(state, obj_id)
        m = np.asarray(mask, np.float32)
        if m.shape != (self.cfg.image_size, self.cfg.image_size):
            m = np.asarray(layers.interpolate(
                jnp.asarray(m, jnp.float32)[None, :, :, None],
                (self.cfg.image_size, self.cfg.image_size), method="bilinear")[0, :, :, 0])
            m = (m > 0.5).astype(np.float32)
        state["mask_inputs_per_obj"][obj_idx][frame_idx] = m
        state["point_inputs_per_obj"][obj_idx].pop(frame_idx, None)
        self._record_prompt_frame(state, frame_idx)
        return self._preview(state, frame_idx)

    train_add_new_mask = add_new_mask

    def _preview(self, state, frame_idx):
        """Lightweight interaction preview: run the prompt step for this frame
        only (memoryless) and return current masks for all objects."""
        spec = self._session_spec(state)
        bank = mb.init_bank(spec, len(state["obj_ids"]))
        out, _ = self._run_prompt_frame(state, bank, frame_idx, spec)
        return frame_idx, list(state["obj_ids"]), np.asarray(out["pred_masks"])

    # ------------------------------------------------------------------
    # Propagation (propagate_in_video :1040 / train_propagate_in_video :1125)
    # ------------------------------------------------------------------

    def propagate_in_video(self, state, start_frame_idx: Optional[int] = None,
                           max_frame_num_to_track: Optional[int] = None,
                           reverse: bool = False):
        """Generator yielding (frame_idx, obj_ids, video_res_masks [B, 1, H, W])."""
        frames, masks = self.propagate_in_video_batch(
            state, start_frame_idx, max_frame_num_to_track, reverse)
        hw = (state["video_height"], state["video_width"])
        for i, f in enumerate(frames):
            frame_masks = masks[i]
            if self.fill_hole_area > 0:
                from medsam2_tpu.ops.connected_components import fill_holes_in_mask_scores
                frame_masks = fill_holes_in_mask_scores(
                    frame_masks, self.fill_hole_area)
            video_res = layers.interpolate(
                jnp.transpose(frame_masks, (0, 2, 3, 1)), hw, method="bilinear")
            video_res = jnp.transpose(video_res, (0, 3, 1, 2))
            if self.non_overlap_masks:
                video_res = sam2_model.apply_non_overlapping_constraints(video_res)
            yield f, list(state["obj_ids"]), video_res

    train_propagate_in_video = propagate_in_video

    def propagate_in_video_batch(self, state, start_frame_idx=None,
                                 max_frame_num_to_track=None, reverse=False):
        """Full propagation in one preflight + one lax.scan. Returns
        (frame index list, low-res mask logits [num_frames_out, B, 1, h4, w4])."""
        if not state["cond_frame_idx"]:
            raise RuntimeError("No prompts added; call add_new_points/mask first.")
        state["tracked"] = True
        num_frames = state["num_frames"]
        B = len(state["obj_ids"])
        spec = self._session_spec(state)
        bank = self._make_bank(spec, B)
        pos_kcache = (sam2_model.make_pos_kcache(self.params, self.cfg, spec)
                      if self.use_kcache else None)

        cond_frames = sorted(state["cond_frame_idx"])
        if start_frame_idx is None:
            start_frame_idx = min(cond_frames)
        if max_frame_num_to_track is None:
            max_frame_num_to_track = num_frames

        images = self._session_images(state)
        kv_on = self.use_kcache and _kv_storage_enabled()

        # --- preflight: process prompt frames, write cond memories ---
        cond_outputs = {}
        cond_ptrs = {}
        for f in cond_frames:
            out, bank = self._run_prompt_frame(state, bank, f, spec)
            cond_outputs[f] = out["pred_masks"]
            cond_ptrs[f] = out["obj_ptr"]
        # Fresh correction frames (add_all_frames_to_correct_as_cond=False)
        # decode at preflight against a RECONSTRUCTED pre-correction bank:
        # cond memories plus the ring window of frames preceding them,
        # re-encoded from the previous round's stored outputs. That is
        # exactly the reference's click-time state (add_new_points reads the
        # per-object output_dict slice, to which same-batch corrections have
        # not yet been merged, sam2_video_predictor.py:355-380), so several
        # fresh corrections in one round stay mutually independent. Their
        # decodes — and those of already-consolidated corrections — are then
        # spliced into the scan, with only the memory re-encoded at scan
        # position (the reference's consolidated_frame_inds reuse,
        # :1086-1096), which keeps repeated propagation idempotent. A
        # correction without retained previous outputs (legacy sessions)
        # falls back to the memoryless prompt decode + ring-slot restore.
        fresh_corr = set()
        corr_reuse = {}
        corr_mem = {}
        for f in sorted(state.get("noncond_prompt_frame_idx", set())):
            if f not in state.get("last_masks", {}):
                out, bank = self._run_prompt_frame(state, bank, f, spec,
                                                   write_cond=False)
                cond_outputs[f] = out["pred_masks"]
                cond_ptrs[f] = out["obj_ptr"]
                corr_mem[f] = (out["maskmem_features"], out["obj_ptr"])
            elif f in state.get("corr_consolidated", set()):
                corr_reuse[f] = self._last_output(state, f)
            else:
                fresh_corr.add(f)
                (coords_f, labels_f, mask_f, use_mask_f, corrected_f,
                 prev_low, prev_ptr, multimask) = self._assemble_correction(
                    state, f)
                # decode in the direction the frame was originally tracked
                # (frames_already_tracked[...]["reverse"], :339-343); the
                # functional bank value is unchanged by the reconstruction
                rev_f = bool(state["frames_tracked"].get(f, False))
                bank_f, _ = self._reconstruct_ring(state, images, bank, f,
                                                   rev_f, spec)
                out, _ = self._corr_step(
                    self.params, images, bank_f, jnp.asarray(f, jnp.int32),
                    coords_f, labels_f, mask_f, use_mask_f, corrected_f,
                    prev_low, prev_ptr, pos_kcache=pos_kcache,
                    multimask_output=multimask, kv_storage=kv_on,
                    spec=spec, is_eval=state["is_eval"],
                    num_frames=num_frames, track_in_reverse=rev_f)
                corr_reuse[f] = (out["pred_masks"].astype(jnp.float32),
                                 out["obj_ptr"].astype(jnp.float32))

        # --- clear_non_cond_mem_around_input, preflight half: pop retained
        # non-cond outputs within +/- r*num_maskmem of every newly-prompted
        # frame, matching the reference's pops at preflight consolidation
        # (non-cond group first, then cond — sam2_video_predictor.py:901-940,
        # 1424-1440). Runs AFTER the correction decodes above: those happen at
        # click time in the reference, before any of this round's pops.
        clear_active = (self.clear_non_cond_mem_around_input
                        and (self.clear_non_cond_mem_for_multi_obj or B <= 1))
        clear_w = (self.cfg.memory_temporal_stride_for_eval
                   * self.cfg.num_maskmem)
        if clear_active:
            new = state.get("new_prompt_frames", set())
            nc_new = sorted(f for f in new
                            if f in state["noncond_prompt_frame_idx"])
            c_new = sorted(f for f in new if f in state["cond_frame_idx"])
            for c in nc_new + c_new:
                self._pop_retention_window(state, c, clear_w)
        # every pending prompt is consolidated by this preflight (the
        # reference clears its temp dicts, :943-945)
        state["new_prompt_frames"] = set()

        # --- frame order (sam2_video_predictor.py:1063-1079: both directions
        # span max_frame_num_to_track+1 frames inclusive of the start frame;
        # reverse from frame 0 is skipped outright) ---
        if reverse:
            end = max(start_frame_idx - max_frame_num_to_track, 0)
            order = (list(range(start_frame_idx, end - 1, -1))
                     if start_frame_idx > 0 else [])
        else:
            end = min(start_frame_idx + max_frame_num_to_track, num_frames - 1)
            order = list(range(start_frame_idx, end + 1))
        if not order:
            return [], jnp.zeros((0, B, 1, 1, 1))

        kw = dict(spec=spec, is_eval=state["is_eval"], num_frames=num_frames,
                  track_in_reverse=reverse)

        # --- resume window: when the order starts past frames tracked in a
        # previous round, re-encode the ring-window of preceding frames from
        # their stored outputs so the readout sees them — matching the
        # reference, whose persistent output_dict still holds those memories
        # on a start_frame_idx resume (sam2_video_predictor.py:1100-1110).
        bank, window = self._reconstruct_ring(state, images, bank, order[0],
                                              reverse, spec)

        # The cond/correction split is host-static, so partition the order
        # into maximal non-cond runs (branch-free scans, no wasted cond-frame
        # encodes) and splice stored prompt-frame masks between them. At a
        # correction frame, additionally restore its preflight-written memory
        # into the non-cond ring: an earlier frame sharing the ring slot
        # (frame % noncond_ring) would have clobbered it before the scan got
        # there (the reference's unbounded per-frame dict never collides,
        # sam2_video_predictor.py:1092-1096).
        seg_masks = []
        seg_ptrs = []
        run: list = []

        def flush_run():
            nonlocal bank
            if run:
                (m, p), bank = self._scan_run(
                    self.params, images, bank,
                    jnp.asarray(run, jnp.int32), pos_kcache,
                    kv_storage=kv_on, collect_ptrs=True, **kw)
                seg_masks.append(m)
                seg_ptrs.append(p)
                run.clear()

        for f in order:
            if f in corr_reuse:
                flush_run()
                prev_low, prev_ptr = corr_reuse[f]
                bank = self._reencode(
                    self.params, images, bank, jnp.asarray(f, jnp.int32),
                    prev_low, prev_ptr, spec=spec, is_eval=state["is_eval"],
                    mask_from_pts=True)
                seg_masks.append(prev_low[None])
                seg_ptrs.append(prev_ptr[None])
                continue
            if f not in cond_outputs:
                run.append(f)
                continue
            flush_run()
            seg_masks.append(
                jnp.asarray(cond_outputs[f], jnp.float32)[None])
            seg_ptrs.append(
                jnp.asarray(cond_ptrs[f], jnp.float32)[None])
            # clear_non_cond_mem_around_input, propagation half: visiting a
            # cond frame re-clears the surrounding non-cond memories before
            # the next segment's readouts (sam2_video_predictor.py:1086-1091;
            # non-cond correction frames don't trigger it, :1092-1096) —
            # segment boundaries are exactly where the reference's pops land.
            if clear_active and f in state["cond_frame_idx"]:
                bank = mb.clear_noncond_window(bank, f, clear_w)
            if f in corr_mem:
                feats_f, ptr_f = corr_mem[f]
                kcache_f = None
                if "kcache" in bank:
                    from medsam2_tpu.core.memory import precompute_memory_kcache
                    mem_h = self.cfg.sam_image_embedding_size
                    kcache_f = precompute_memory_kcache(
                        self.params["memory_attention"],
                        self.cfg.memory_attention,
                        feats_f, (mem_h, mem_h),
                        dtype=bank["kcache"].dtype)
                bank = mb.write_bank(spec, bank, jnp.asarray(f, jnp.int32),
                                     feats_f, ptr_f, is_cond=False,
                                     kcache=kcache_f)
        flush_run()
        masks = jnp.concatenate(seg_masks, axis=0)
        ptrs = jnp.concatenate(seg_ptrs, axis=0)
        # Retain per-frame outputs so later correction clicks can decode
        # against them, mirroring the reference's frames_already_tracked /
        # output_dict retention. Stored as (stacked array, row) refs — the
        # stack stays one device array (or one host copy under
        # offload_state_to_cpu); slicing is deferred to correction time.
        keep_m, keep_p = masks, ptrs
        if state.get("offload_state"):
            keep_m, keep_p = np.asarray(masks), np.asarray(ptrs)
        pre_keys = set(state["last_masks"])
        for i, f in enumerate(order):
            state["frames_tracked"][f] = reverse
            state["last_masks"][f] = (keep_m, i)
            state["last_ptrs"][f] = (keep_p, i)
        if clear_active:
            # replay the run's write/clear sequence over the retained-output
            # key set: the reference's dict loses every non-cond frame popped
            # by a cond-frame clear and not rewritten afterwards, so those
            # frames must not offer prev outputs to later corrections/resumes
            cond_set = state["cond_frame_idx"]
            held_nc = {f for f in pre_keys if f not in cond_set}
            for f in order:
                if f in cond_set:
                    for p in range(f - clear_w, f + clear_w + 1):
                        held_nc.discard(p)
                else:
                    held_nc.add(f)
            for p in [f for f in state["last_masks"]
                      if f not in cond_set and f not in held_nc]:
                state["last_masks"].pop(p, None)
                state["last_ptrs"].pop(p, None)
        # fresh corrections decoded this round are consolidated once their
        # output was retained (frame in order): later rounds reuse the stored
        # output instead of re-applying the clicks
        state.setdefault("corr_consolidated", set()).update(
            fresh_corr & set(order))
        # consolidated corrections outside the order are still honored when
        # the resume window re-encoded them; only truly unreachable ones warn
        missed = ((fresh_corr - set(order))
                  | (set(corr_reuse) - fresh_corr - set(order) - set(window)))
        if missed:
            import warnings
            warnings.warn(
                f"corrections on frames {sorted(missed)} are outside this "
                "propagation's frame order (and its resume window) and had "
                "no effect; memory here is rebuilt per call from the frames "
                "it processes — re-propagate with an order covering them.",
                stacklevel=2)
        return order, masks

    # ------------------------------------------------------------------

    def _reconstruct_ring(self, state, images, bank, anchor: int,
                          reverse: bool, spec):
        """Re-encode the non-cond ring window preceding ``anchor`` (in the
        ``reverse`` tracking direction) from the session's retained outputs
        into ``bank``. Written oldest-in-scan-time first so frame-index slot
        collisions resolve exactly as a continuous scan would have left them;
        the walk covers both the feature ring and the (possibly longer)
        pointer ring. Consolidated corrections re-encode as mask-from-points,
        like the reference's preflight consolidation; plain tracked frames as
        their track-time encode did. Returns (bank, window frame list)."""
        window: list = []
        step = -1 if reverse else 1
        owned_f: set = set()
        owned_p: set = set()
        num_frames = state["num_frames"]
        j = anchor - step
        while (0 <= j < num_frames
               and (len(owned_f) < spec.noncond_ring
                    or len(owned_p) < spec.ptr_ring)):
            if j in state["cond_frame_idx"]:
                j -= step
                continue
            if j not in state.get("frames_tracked", {}):
                break
            owned_f.add(j % spec.noncond_ring)
            owned_p.add(j % spec.ptr_ring)
            if j in state.get("last_masks", {}):
                window.append(j)
            # else: tracked but its retained output was popped by
            # clear_non_cond_mem_around_input — a continuous scan would have
            # written this frame into its slot and then invalidated it, so
            # the frame still OWNS its ring slots (blocking older frames from
            # resurfacing there) but contributes no memory. Older frames that
            # re-encode into a popped frame's slot are readout-equivalent:
            # the slot's stored index can only match a stride-r target when
            # no newer in-window frame shared it.
            j -= step
        for wf in reversed(window):
            prev_low_w, prev_ptr_w = self._last_output(state, wf)
            bank = self._reencode(
                self.params, images, bank, jnp.asarray(wf, jnp.int32),
                prev_low_w, prev_ptr_w, spec=spec, is_eval=state["is_eval"],
                mask_from_pts=(wf in state.get("corr_consolidated", set())))
        return bank, window

    @staticmethod
    def _pop_retention_window(state, center: int, radius: int) -> None:
        """Session half of ``_clear_non_cond_mem_around_input``
        (``sam2_video_predictor.py:1424-1440``): drop the retained outputs of
        non-cond frames within ``[center - radius, center + radius]``. The
        reference pops the whole frame entry, so popped frames lose their
        prev-output for later correction clicks and for ring-window
        reconstruction alike; cond-frame outputs live under the cond key and
        are never popped. ``frames_tracked`` (the reference's separate
        ``frames_already_tracked``) is intentionally kept."""
        for p in range(center - radius, center + radius + 1):
            if p in state["cond_frame_idx"]:
                continue
            state["last_masks"].pop(p, None)
            state["last_ptrs"].pop(p, None)

    @staticmethod
    def _last_output(state, frame_idx):
        """The frame's retained (mask logits [B,1,h4,w4], obj ptr [B,C]) from
        the most recent propagation that covered it."""
        arr_m, i = state["last_masks"][frame_idx]
        arr_p, j = state["last_ptrs"][frame_idx]
        return (jnp.asarray(arr_m[i], jnp.float32),
                jnp.asarray(arr_p[j], jnp.float32))

    def _assemble_correction(self, state, frame_idx):
        """Host inputs for a correction frame: padded point prompts, per-object
        corrected/use_mask flags, and the frame's retained previous outputs.
        Iterative clicking between propagations merges into one decode here
        (the reference compounds decodes through its temp dict instead,
        ``sam2_video_predictor.py:355-366`` — the fork's engines never do
        that); the decodes agree whenever each frame is corrected once per
        propagation round."""
        B = len(state["obj_ids"])
        S = self.cfg.image_size
        P = max(1, min(self.cfg.max_prompt_points, max(
            (len(state["point_inputs_per_obj"][o].get(frame_idx, ((), ()))[1])
             for o in range(B)), default=1)))
        coords = np.zeros((B, P, 2), np.float32)
        labels = -np.ones((B, P), np.int32)
        mask_inputs = np.zeros((B, S, S, 1), np.float32)
        use_mask = np.zeros((B,), bool)
        corrected = np.zeros((B,), bool)
        max_pts = 0
        for o in range(B):
            pts = state["point_inputs_per_obj"][o].get(frame_idx)
            msk = state["mask_inputs_per_obj"][o].get(frame_idx)
            if pts is not None:
                c, l = pts
                n = min(len(l), P)
                coords[o, :n] = c[:n]
                labels[o, :n] = l[:n]
                corrected[o] = True
                max_pts = max(max_pts, n)
            elif msk is not None:
                mask_inputs[o, :, :, 0] = msk
                use_mask[o] = True
        multimask = sam2_model.use_multimask(self.cfg, False, max_pts)
        prev_low, prev_ptr = self._last_output(state, frame_idx)
        return (jnp.asarray(coords), jnp.asarray(labels),
                jnp.asarray(mask_inputs), jnp.asarray(use_mask),
                jnp.asarray(corrected), prev_low, prev_ptr, multimask)

    def _run_prompt_frame(self, state, bank, frame_idx, spec=None,
                          write_cond: bool = True):
        """Assemble per-object prompts for a frame and run the prompt step."""
        if spec is None:
            spec = self._session_spec(state)
        B = len(state["obj_ids"])
        S = self.cfg.image_size
        # Pad sparse prompts to this frame's max point count (capped at the
        # config's static ceiling). The reference runs each object's prompt at
        # its exact count (``sam2_video_predictor.py:292-360``); padding to the
        # frame max keeps token counts identical whenever objects share a count
        # (extra slots embed as not-a-point, the reference's own pad token).
        P = max(1, min(self.cfg.max_prompt_points, max(
            (len(state["point_inputs_per_obj"][o].get(frame_idx, ((), ()))[1])
             for o in range(B)), default=1)))
        coords = np.zeros((B, P, 2), np.float32)
        labels = -np.ones((B, P), np.int32)
        mask_inputs = np.zeros((B, S, S, 1), np.float32)
        use_mask = np.zeros((B,), bool)
        max_pts = 0
        for obj_idx in range(B):
            pts = state["point_inputs_per_obj"][obj_idx].get(frame_idx)
            msk = state["mask_inputs_per_obj"][obj_idx].get(frame_idx)
            if pts is not None:
                c, l = pts
                n = min(len(l), P)
                coords[obj_idx, :n] = c[:n]
                labels[obj_idx, :n] = l[:n]
                max_pts = max(max_pts, n)
            elif msk is not None:
                mask_inputs[obj_idx, :, :, 0] = msk
                use_mask[obj_idx] = True
            else:
                # object not prompted on this cond frame: treated as an empty
                # mask prompt (the reference fills NO_OBJ_SCORE placeholders at
                # consolidation, sam2_video_predictor.py:746-806 — an all-zero
                # mask produces the same ~0 memory)
                use_mask[obj_idx] = True
        multimask = sam2_model.use_multimask(self.cfg, True, max_pts)
        out, bank = self._prompt_step(
            self.params, self._session_images(state), bank,
            jnp.asarray(frame_idx, jnp.int32),
            jnp.asarray(coords), jnp.asarray(labels), jnp.asarray(mask_inputs),
            jnp.asarray(use_mask),
            spec=spec, multimask_output=multimask, is_eval=state["is_eval"],
            num_frames=state["num_frames"], write_cond=write_cond,
        )
        return out, bank


# ---------------------------------------------------------------------------
# jitted cores
# ---------------------------------------------------------------------------


def _dtype(cfg: SAM2Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _encode_frame(params, frame, *, cfg: SAM2Config, trunk_pos_embed=None):
    """frame [1, S, S, 3] -> (feats list, pos list)."""
    backbone_out = sam2_model.forward_image(params, cfg, frame.astype(_dtype(cfg)),
                                            trunk_pos_embed=trunk_pos_embed)
    feats, pos, _ = sam2_model.prepare_backbone_features(cfg, backbone_out)
    return feats, pos


def _expand_to_objects(feats, pos, B):
    """Tile encoded frame features to B batch rows: broadcast for a single
    source frame, interleaved repeat (row = frame * objects + object) when
    several frames are folded into the batch (multi-volume streaming)."""
    def exp(x):
        n = x.shape[0]
        if n == B:
            return x
        if n == 1:
            return jnp.broadcast_to(x, (B, *x.shape[1:]))
        return jnp.repeat(x, B // n, axis=0)
    return [exp(f) for f in feats], [exp(p) for p in pos]


def _select_frame(images, frame_idx):
    """Current frame(s) for a step: [T, S, S, 3] video -> [1, S, S, 3];
    folded multi-volume [V, T, S, S, 3] -> [V, S, S, 3] (each volume's own
    frame at the shared index)."""
    if images.ndim == 5:
        return jax.lax.dynamic_index_in_dim(images, frame_idx, axis=1,
                                            keepdims=False)
    return jax.lax.dynamic_index_in_dim(images, frame_idx, axis=0,
                                        keepdims=True)


def _prompt_step(params, images, bank, frame_idx, coords, labels, mask_inputs,
                 use_mask, *, cfg: SAM2Config, spec: mb.BankSpec,
                 multimask_output: bool, is_eval: bool, num_frames: int,
                 write_cond: bool = True):
    """Conditioning-frame step: encode image, run point AND mask-prompt paths,
    select per object, consolidate, encode + write cond memory."""
    B = coords.shape[0]
    frame = _select_frame(images, frame_idx)
    feats, pos = _encode_frame(params, frame, cfg=cfg)
    feats, pos = _expand_to_objects(feats, pos, B)
    high_res = feats[:-1] if len(feats) > 1 else None

    # point path (is_init_cond_frame=True: no_mem_embed added directly)
    pix = feats[-1]
    Bp, h, w, C = pix.shape
    pix_mem = (pix.reshape(Bp, h * w, C)
               + params["no_mem_embed"].astype(pix.dtype)).reshape(Bp, h, w, C)
    point_out = sam2_model.forward_sam_heads(
        params, cfg, pix_mem,
        point_inputs={"point_coords": coords, "point_labels": labels},
        high_res_features=high_res, multimask_output=multimask_output,
        eval_dynamic_multimask=is_eval,
    )
    # mask path (use_mask_input_as_output_without_sam)
    mask_out = sam2_model.use_mask_as_output(params, cfg, pix, high_res, mask_inputs)

    def sel(a, b):
        shape = (B,) + (1,) * (a.ndim - 1)
        return jnp.where(use_mask.reshape(shape), b, a)

    low_res = sel(point_out.low_res_masks, mask_out.low_res_masks)
    high_res_masks = sel(point_out.high_res_masks, mask_out.high_res_masks)
    obj_ptr = sel(point_out.obj_ptr, mask_out.obj_ptr)
    obj_score = sel(point_out.object_score_logits, mask_out.object_score_logits)

    maskmem_features, _ = sam2_model.encode_new_memory(
        params, cfg, feats[-1], high_res_masks,
        is_mask_from_pts=~use_mask, binarize=is_eval,
        apply_non_overlap=(cfg.non_overlap_masks_for_mem_enc and is_eval),
    )
    kcache = None
    if "kcache" in bank:
        from medsam2_tpu.core.memory import precompute_memory_kcache
        mem_h = cfg.sam_image_embedding_size
        kcache = precompute_memory_kcache(
            params["memory_attention"], cfg.memory_attention, maskmem_features,
            (mem_h, mem_h), dtype=bank["kcache"].dtype)
    bank = mb.write_bank(spec, bank, frame_idx, maskmem_features, obj_ptr,
                         is_cond=write_cond, kcache=kcache)
    out = {
        "pred_masks": low_res,
        "pred_masks_high_res": high_res_masks,
        "obj_ptr": obj_ptr,
        "object_score_logits": obj_score,
        "maskmem_features": maskmem_features,
    }
    return out, bank


def _correction_step(params, images, bank, frame_idx, coords, labels,
                     mask_inputs, use_mask, corrected, prev_low, prev_ptr, *,
                     cfg: SAM2Config, spec: mb.BankSpec,
                     multimask_output: bool, is_eval: bool, num_frames: int,
                     track_in_reverse: bool, pos_kcache=None,
                     kv_storage: bool = False):
    """Correction-frame step, matching the reference's re-prompt semantics
    (``sam2_video_predictor.py:293-399`` + the preflight consolidation,
    ``:746-897``): point-corrected objects decode *memory-conditioned* with
    their previous mask logits (clamped to +/-32) fed back as a mask prompt;
    mask-corrected objects take the direct mask-as-output path; objects not
    re-prompted on this frame keep their previous tracked output. The
    selected masks are re-encoded (``is_mask_from_pts=True`` for every
    object, as the reference consolidation does) and written to the non-cond
    ring at this frame's scan position, where the bank state equals the
    reference's per-frame dict for a deterministic re-propagation.

    prev_low: the frame's mask logits from the previous propagation
    [B, 1, h4, w4]; prev_ptr: its object pointers [B, C].
    """
    B = coords.shape[0]
    frame = _select_frame(images, frame_idx)
    feats, pos = _encode_frame(params, frame, cfg=cfg)
    feats, pos = _expand_to_objects(feats, pos, B)
    high_res = feats[:-1] if len(feats) > 1 else None

    pix_with_mem = sam2_model.prepare_memory_conditioned_features(
        params, cfg, spec, bank, frame_idx, False,
        feats[-1], pos[-1], track_in_reverse=track_in_reverse,
        num_frames=num_frames, is_eval=is_eval, pos_kcache=pos_kcache,
        kv_storage=kv_storage,
    )
    # previous logits re-fed as a mask prompt, clamped like the reference's
    # prev_sam_mask_logits (sam2_video_predictor.py:362-366)
    prev_prompt = jnp.clip(prev_low.astype(jnp.float32), -32.0, 32.0)
    point_out = sam2_model.forward_sam_heads(
        params, cfg, pix_with_mem,
        point_inputs={"point_coords": coords, "point_labels": labels},
        mask_inputs=prev_prompt.transpose(0, 2, 3, 1),
        high_res_features=high_res, multimask_output=multimask_output,
        eval_dynamic_multimask=is_eval,
    )
    mask_out = sam2_model.use_mask_as_output(params, cfg, feats[-1], high_res,
                                             mask_inputs)
    prev_high = layers.interpolate(
        prev_low.astype(jnp.float32).transpose(0, 2, 3, 1),
        (cfg.image_size, cfg.image_size), method="bilinear",
    ).transpose(0, 3, 1, 2)

    def sel(point_v, mask_v, prev_v):
        shape = (B,) + (1,) * (point_v.ndim - 1)
        return jnp.where(use_mask.reshape(shape), mask_v,
                         jnp.where(corrected.reshape(shape), point_v, prev_v))

    low_res = sel(point_out.low_res_masks, mask_out.low_res_masks,
                  prev_low.astype(jnp.float32))
    high_res_masks = sel(point_out.high_res_masks, mask_out.high_res_masks,
                         prev_high)
    obj_ptr = sel(point_out.obj_ptr, mask_out.obj_ptr, prev_ptr)

    maskmem_features, _ = sam2_model.encode_new_memory(
        params, cfg, feats[-1], high_res_masks,
        is_mask_from_pts=True, binarize=is_eval,
        apply_non_overlap=(cfg.non_overlap_masks_for_mem_enc and is_eval),
    )
    kcache = None
    if "kcache" in bank:
        from medsam2_tpu.core.memory import precompute_memory_kcache
        mem_h = cfg.sam_image_embedding_size
        kcache = precompute_memory_kcache(
            params["memory_attention"], cfg.memory_attention, maskmem_features,
            (mem_h, mem_h), dtype=bank["kcache"].dtype)
    bank = mb.write_bank(spec, bank, frame_idx, maskmem_features, obj_ptr,
                         is_cond=False, kcache=kcache)
    return {"pred_masks": low_res, "obj_ptr": obj_ptr}, bank


def _reencode_correction(params, images, bank, frame_idx, prev_low, prev_ptr,
                         *, cfg: SAM2Config, spec: mb.BankSpec, is_eval: bool,
                         mask_from_pts: bool = True):
    """Re-encode a frame's memory from its stored decode (mask logits +
    pointer) and write it to the non-cond ring — no re-decode. Used for
    consolidated correction frames on repeated propagation (the reference's
    consolidated_frame_inds path, ``sam2_video_predictor.py:1086-1096``;
    ``mask_from_pts=True``, as the preflight consolidation encodes) and for
    reconstructing the ring window when a propagation resumes past previously
    tracked frames (``mask_from_pts=False``, as their track-time encode used).
    Returns the updated bank."""
    B = prev_low.shape[0]
    frame = _select_frame(images, frame_idx)
    feats, pos = _encode_frame(params, frame, cfg=cfg)
    feats, _ = _expand_to_objects(feats, pos, B)
    prev_high = layers.interpolate(
        prev_low.astype(jnp.float32).transpose(0, 2, 3, 1),
        (cfg.image_size, cfg.image_size), method="bilinear",
    ).transpose(0, 3, 1, 2)
    maskmem_features, _ = sam2_model.encode_new_memory(
        params, cfg, feats[-1], prev_high,
        is_mask_from_pts=mask_from_pts, binarize=is_eval,
        apply_non_overlap=(cfg.non_overlap_masks_for_mem_enc and is_eval),
    )
    kcache = None
    if "kcache" in bank:
        from medsam2_tpu.core.memory import precompute_memory_kcache
        mem_h = cfg.sam_image_embedding_size
        kcache = precompute_memory_kcache(
            params["memory_attention"], cfg.memory_attention, maskmem_features,
            (mem_h, mem_h), dtype=bank["kcache"].dtype)
    return mb.write_bank(spec, bank, frame_idx, maskmem_features, prev_ptr,
                         is_cond=False, kcache=kcache)


def _scan_track_run(params, images, bank, frame_order, pos_kcache=None, *,
                    cfg: SAM2Config, spec: mb.BankSpec, is_eval: bool,
                    num_frames: int, track_in_reverse: bool,
                    kv_storage: bool = False, collect_ptrs: bool = False):
    """Branch-free ``lax.scan`` over a run of consecutive NON-cond frames.

    The cond/non-cond split is host-static (prompt frames are recorded in the
    session state), so the propagation loop never needs a per-frame
    ``lax.cond``: the caller partitions the frame order into maximal non-cond
    runs and splices stored cond-frame masks between them. This both removes
    the select machinery from the scan body and skips the (discarded) encoder
    pass the unified body paid on every cond frame. Returns
    (low-res mask logits [L, B, 1, h4, w4], bank), or
    ((masks, obj_ptrs [L, B, C]), bank) with ``collect_ptrs`` (the predictor
    retains per-frame pointers so later correction clicks can fall back to
    them, mirroring the reference's per-frame output dict).
    """
    B = bank["cond_feats"].shape[0]
    from medsam2_tpu.core.hiera import _get_pos_embed
    S = images.shape[-2]
    trunk_pe = _get_pos_embed(params["image_encoder"]["trunk"], S // 4, S // 4)

    def body(bank, frame_idx):
        frame = _select_frame(images, frame_idx)
        feats, pos = _encode_frame(params, frame, cfg=cfg,
                                   trunk_pos_embed=trunk_pe)
        feats, pos = _expand_to_objects(feats, pos, B)
        out, bank = sam2_model.track_step(
            params, cfg, spec, bank, frame_idx,
            is_init_cond_frame=False,
            current_vision_feats=feats, current_vision_pos=pos,
            point_inputs=None, mask_inputs=None,
            multimask_output=sam2_model.use_multimask(cfg, False, 0),
            run_mem_encoder=True, is_cond_frame=False,
            track_in_reverse=track_in_reverse,
            num_frames=num_frames, is_eval=is_eval,
            pos_kcache=pos_kcache, kv_storage=kv_storage,
        )
        masks = out["pred_masks"].astype(jnp.float32)
        if collect_ptrs:
            return bank, (masks, out["obj_ptr"].astype(jnp.float32))
        return bank, masks

    bank, ys = jax.lax.scan(body, bank, frame_order)
    return ys, bank


def _scan_track(params, images, bank, frame_order, is_cond, stored_masks,
                pos_kcache=None, *,
                cfg: SAM2Config, spec: mb.BankSpec, is_eval: bool,
                num_frames: int, track_in_reverse: bool,
                encode_chunk: int = 0, return_bank: bool = False):
    """lax.scan over frames: track each non-cond frame with memory, reuse
    stored outputs on cond frames. Returns low-res mask logits
    [T_out, B, 1, h4, w4].

    Kept for dynamic ``is_cond`` callers and the ``encode_chunk`` experiment;
    the predictor's eval path uses the segmented ``_scan_track_run`` (the
    cond split is host-static there).

    ``encode_chunk > 0`` pre-encodes frames in batched chunks before the
    memory-dependent scan (the encoder has no cross-frame dependency).
    Measured on the v5e-lite chip this is *slower* than inline encoding
    (37 vs 47 fps @1024 — the feature round-trip through HBM outweighs the
    MXU batching win), so inline is the default; larger chips may differ.
    """
    B = bank["cond_feats"].shape[0]
    from medsam2_tpu.core.hiera import _get_pos_embed
    S = images.shape[1]
    trunk_pe = _get_pos_embed(params["image_encoder"]["trunk"], S // 4, S // 4)
    T = frame_order.shape[0]

    all_feats = all_pos = None
    if encode_chunk > 0:
        c = max(min(encode_chunk, T), 1)
        pad = (-T) % c
        order_p = jnp.concatenate([frame_order,
                                   jnp.broadcast_to(frame_order[-1:], (pad,))])
        chunks = order_p.reshape(-1, c)

        def encode_chunk_fn(idx_chunk):
            frames = jnp.take(images, idx_chunk, axis=0)
            return _encode_frame(params, frames, cfg=cfg, trunk_pos_embed=trunk_pe)

        feats_c, pos_c = jax.lax.map(encode_chunk_fn, chunks)
        all_feats = [f.reshape(-1, *f.shape[2:])[:T] for f in feats_c]
        all_pos = [p.reshape(-1, *p.shape[2:])[:T] for p in pos_c]

    def body(bank, xs):
        t, cond_flag, stored = xs
        frame_idx = frame_order[t]
        if encode_chunk > 0:
            feats = [jax.lax.dynamic_index_in_dim(f, t, 0, keepdims=True)
                     for f in all_feats]
            pos = [jax.lax.dynamic_index_in_dim(p, t, 0, keepdims=True)
                   for p in all_pos]
        else:
            frame = jax.lax.dynamic_index_in_dim(images, frame_idx, 0, keepdims=True)
            feats, pos = _encode_frame(params, frame, cfg=cfg,
                                       trunk_pos_embed=trunk_pe)
        feats, pos = _expand_to_objects(feats, pos, B)

        def tracked(bank):
            out, bank = sam2_model.track_step(
                params, cfg, spec, bank, frame_idx,
                is_init_cond_frame=False,
                current_vision_feats=feats, current_vision_pos=pos,
                point_inputs=None, mask_inputs=None,
                multimask_output=sam2_model.use_multimask(cfg, False, 0),
                run_mem_encoder=True, is_cond_frame=False,
                track_in_reverse=track_in_reverse,
                num_frames=num_frames, is_eval=is_eval,
                pos_kcache=pos_kcache,
            )
            return out["pred_masks"].astype(jnp.float32), bank

        def reuse(bank):
            return stored, bank

        masks, bank = jax.lax.cond(cond_flag, reuse, tracked, bank)
        return bank, masks

    bank, masks = jax.lax.scan(
        body, bank, (jnp.arange(T, dtype=jnp.int32), is_cond, stored_masks))
    if return_bank:
        return masks, bank
    return masks


def propagate_volumes_batched(params, cfg: SAM2Config, spec: mb.BankSpec,
                              videos: jnp.ndarray, prompt_coords: jnp.ndarray,
                              prompt_labels: jnp.ndarray,
                              num_objects: int = 1,
                              prompt_frames: Tuple[int, ...] = (0,),
                              fold: Optional[bool] = None) -> jnp.ndarray:
    """Batched multi-volume streaming (BASELINE config 5): vmap the full
    preflight + scan pipeline over a volume axis so several CT volumes stream
    through the ring-buffer memory bank concurrently on one chip (or sharded
    over the ``data`` mesh axis).

    videos: [V, T, S, S, 3] normalized; prompt_coords/labels:
    [V, F, O, P, 2] / [V, F, O, P] — one prompt set per ``prompt_frames``
    entry (static tuple). Bbox prompts use the 2-corner label convention
    (labels 2/3), matching the BTCV eval shape of a box every ``prompt_freq``
    frames (``func_3d/function.py:98-127``). A rank-4/3 coords/labels input is
    accepted as the legacy single-prompt-frame form (F=1 at frame 0).
    Returns low-res logits [V, T, O, 1, h4, h4].

    ``fold=True`` runs volumes on the batch axis of ONE bank/scan (B = V * O)
    instead of vmapping the pipeline — identical math (the frame schedule is
    volume-uniform, so bank slot arithmetic is shared across rows), but the
    memory attention becomes a single batched call, which the storage-order
    kv readout can serve; its scalar-prefetch Pallas kernel cannot be
    vmapped. Measured on the v5e chip (round 4): 580.3 fps folded vs 495.5
    vmapped @512/4vol (+17%, MFU 23.8 -> 27.9%), so ``fold=None`` (the
    default) resolves to ON; ``MEDSAM2_FOLD=0`` opts out.
    """
    if fold is None:
        fold = os.environ.get("MEDSAM2_FOLD", "1") == "1"
    T = videos.shape[1]
    if prompt_coords.ndim == 4:   # legacy [V, O, P, 2] form
        prompt_coords = prompt_coords[:, None]
        prompt_labels = prompt_labels[:, None]
    F = len(prompt_frames)
    if prompt_coords.shape[1] != F:
        raise ValueError(
            f"prompt_coords has {prompt_coords.shape[1]} prompt-frame sets "
            f"but prompt_frames={prompt_frames!r}")
    if spec.max_cond_frames < F:
        raise ValueError(
            f"spec.max_cond_frames={spec.max_cond_frames} cannot hold "
            f"{F} conditioning frames")

    if fold:
        return _propagate_volumes_folded(
            params, cfg, spec, videos, prompt_coords, prompt_labels,
            num_objects, prompt_frames)

    from medsam2_tpu.core.hiera import _get_pos_embed
    S = videos.shape[2]
    trunk_pe = _get_pos_embed(params["image_encoder"]["trunk"], S // 4, S // 4)
    is_cond = np.zeros((T,), bool)
    for f in prompt_frames:
        is_cond[f] = True
    kshape = sam2_model.kcache_shape(cfg)
    pos_kcache = (sam2_model.make_pos_kcache(params, cfg, spec)
                  if kshape[0] > 0 else None)

    def one_volume(video, coords, labels):
        bank = mb.init_bank(spec, num_objects, kcache_shape=kshape,
                            kcache_dtype=sam2_model.kcache_dtype(cfg))
        cond_masks = {}
        for i, f in enumerate(prompt_frames):
            out, bank = _prompt_step(
                params, video, bank, jnp.int32(f), coords[i], labels[i],
                jnp.zeros((num_objects, cfg.image_size, cfg.image_size, 1),
                          jnp.float32),
                jnp.zeros((num_objects,), bool),
                cfg=cfg, spec=spec, multimask_output=False, is_eval=True,
                num_frames=T)
            cond_masks[f] = out["pred_masks"].astype(jnp.float32)

        def body(bank, frame_idx):
            frame = jax.lax.dynamic_index_in_dim(video, frame_idx, 0, keepdims=True)
            feats, pos = _encode_frame(params, frame, cfg=cfg,
                                       trunk_pos_embed=trunk_pe)
            feats, pos = _expand_to_objects(feats, pos, num_objects)
            o, bank = sam2_model.track_step(
                params, cfg, spec, bank, frame_idx,
                is_init_cond_frame=False,
                current_vision_feats=feats, current_vision_pos=pos,
                multimask_output=sam2_model.use_multimask(cfg, False, 0),
                run_mem_encoder=True, is_cond_frame=False,
                num_frames=T, is_eval=True, pos_kcache=pos_kcache)
            return bank, o["pred_masks"].astype(jnp.float32)

        # prompt frames are static: partition [0, T) into maximal non-cond
        # runs (branch-free scans) and splice the preflight masks between them
        seg_masks = []
        run = []
        for f in range(T):
            if is_cond[f]:
                if run:
                    bank, m = jax.lax.scan(body, bank,
                                           jnp.asarray(run, jnp.int32))
                    seg_masks.append(m)
                    run = []
                seg_masks.append(cond_masks[f][None])
            else:
                run.append(f)
        if run:
            _, m = jax.lax.scan(body, bank, jnp.asarray(run, jnp.int32))
            seg_masks.append(m)
        return jnp.concatenate(seg_masks, axis=0)

    return jax.vmap(one_volume)(videos, prompt_coords, prompt_labels)


def _propagate_volumes_folded(params, cfg: SAM2Config, spec: mb.BankSpec,
                              videos, prompt_coords, prompt_labels,
                              num_objects: int, prompt_frames):
    """Volume-folded streaming (see ``propagate_volumes_batched(fold=True)``):
    one bank with B = V * O rows (row = volume * O + object), a shared frame
    schedule, and the segmented branch-free scan of the single-volume path."""
    V, T = videos.shape[:2]
    O = num_objects
    B = V * O
    P = prompt_coords.shape[-2]
    kshape = sam2_model.kcache_shape(cfg)
    pos_kcache = (sam2_model.make_pos_kcache(params, cfg, spec)
                  if kshape[0] > 0 else None)
    bank = mb.init_bank(spec, B, kcache_shape=kshape,
                        kcache_dtype=sam2_model.kcache_dtype(cfg))

    cond_masks = {}
    for i, f in enumerate(prompt_frames):
        out, bank = _prompt_step(
            params, videos, bank, jnp.int32(f),
            prompt_coords[:, i].reshape(B, P, 2),
            prompt_labels[:, i].reshape(B, P),
            jnp.zeros((B, cfg.image_size, cfg.image_size, 1), jnp.float32),
            jnp.zeros((B,), bool),
            cfg=cfg, spec=spec, multimask_output=False, is_eval=True,
            num_frames=T)
        cond_masks[f] = out["pred_masks"].astype(jnp.float32)

    is_cond = np.zeros((T,), bool)
    for f in prompt_frames:
        is_cond[f] = True
    kw = dict(cfg=cfg, spec=spec, is_eval=True, num_frames=T,
              track_in_reverse=False,
              kv_storage=("kcache" in bank) and _kv_storage_enabled())
    seg_masks = []
    run: list = []

    def flush(bank):
        if run:
            m, bank = _scan_track_run(params, videos, bank,
                                      jnp.asarray(run, jnp.int32),
                                      pos_kcache, **kw)
            seg_masks.append(m)
            run.clear()
        return bank

    for f in range(T):
        if is_cond[f]:
            bank = flush(bank)
            seg_masks.append(cond_masks[f][None])
        else:
            run.append(f)
    bank = flush(bank)
    masks = jnp.concatenate(seg_masks, axis=0)      # [T, B, 1, h4, h4]
    h4 = masks.shape[-1]
    return masks.reshape(T, V, O, 1, h4, h4).transpose(1, 0, 2, 3, 4, 5)


def _frame_paths(video_path: str):
    names = [p for p in os.listdir(video_path)
             if os.path.splitext(p)[-1].lower() in (".jpg", ".jpeg")]
    names.sort(key=lambda p: int(os.path.splitext(p)[0]))
    if not names:
        raise RuntimeError(f"no JPEG frames found in {video_path}")
    return [os.path.join(video_path, n) for n in names]


def _decode_frame(path: str, image_size: int):
    """One JPEG -> normalized float32 [S, S, 3] + original (h, w)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    vw, vh = img.size
    img = img.resize((image_size, image_size))
    arr = np.asarray(img, np.float32) / 255.0
    return ((arr - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32), vh, vw


def _load_video_frames_dir(video_path: str, image_size: int):
    """Load ``<idx>.jpg`` frames from a directory (``utils/misc.py:163-213``)."""
    frames = []
    vh = vw = None
    for path in _frame_paths(video_path):
        f, vh, vw = _decode_frame(path, image_size)
        frames.append(f)
    return jnp.asarray(np.stack(frames)), vh, vw


class _AsyncFrameLoader:
    """Background-thread JPEG decoding (the reference's AsyncVideoFrameLoader,
    ``utils/misc.py:104-160``, redesigned for the scan-based propagation: the
    session starts immediately while a daemon thread fills a preallocated host
    array; ``wait()`` joins and hands the full video over in one transfer —
    TPU propagation is a single ``lax.scan`` over a device tensor, so
    per-frame device puts would only add dispatch latency)."""

    def __init__(self, video_path: str, image_size: int):
        import threading

        self.paths = _frame_paths(video_path)
        # first frame synchronously: fills video_height/width and is the frame
        # the user will interact with (same choice as the reference)
        first, self.video_height, self.video_width = _decode_frame(
            self.paths[0], image_size)
        self.frames = np.empty((len(self.paths), image_size, image_size, 3),
                               np.float32)
        self.frames[0] = first
        self.exception = None

        def _load_rest():
            try:
                for i in range(1, len(self.paths)):
                    self.frames[i] = _decode_frame(self.paths[i], image_size)[0]
            except Exception as e:  # surfaced on wait()
                self.exception = e

        self.thread = threading.Thread(target=_load_rest, daemon=True)
        self.thread.start()

    def __len__(self):
        return len(self.paths)

    def wait(self) -> np.ndarray:
        self.thread.join()
        if self.exception is not None:
            raise RuntimeError("Failure in frame loading thread") from self.exception
        return self.frames

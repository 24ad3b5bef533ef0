"""Decompose the propagation-scan 'glue' (~2.7 ms/frame @1024: scan body
minus isolated encoder+track): slope-time ablated variants of the real body.

  FULL      the production segmented body (= bench path, kcache bank)
  NOSLICE   same but encoding a fixed pre-cast bf16 frame (removes the
            fp32 video dynamic-slice + cast)
  TRACK_KC  track-only on fixed features WITH the kcache bank (the kcache
            counterpart of profile_scan's B)
  ENC       encoder-only (profile_scan's C, for reference)

glue attribution: FULL-NOSLICE = slice+cast; NOSLICE-TRACK_KC-ENC =
cross-component fusion/layout loss inside the combined body.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import get_config
from medsam2_tpu.core import sam2_model
from medsam2_tpu.api.video_predictor import (
    SAM2VideoPredictor, _encode_frame, _expand_to_objects)

N1, N2 = 8, 24


def timed_n(build_run, n):
    run = build_run(n)
    jax.block_until_ready(run())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def slope(build_run, label):
    t1 = timed_n(build_run, N1)
    t2 = timed_n(build_run, N2)
    s = (t2 - t1) / (N2 - N1)
    print(f"{label:10s}: {s*1e3:7.3f} ms/frame   (t{N1}={t1*1e3:7.1f}  t{N2}={t2*1e3:7.1f})",
          flush=True)
    return s


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    pred = SAM2VideoPredictor(params, cfg, max_cond_frames=1)
    rng = np.random.default_rng(0)

    T = N2 + 1
    video = (rng.random((T, S, S, 3)) * 255).astype(np.float32)
    state = pred.init_state(images=video)
    pred.add_new_points(state, frame_idx=0, obj_id=0,
                        points=np.array([[S // 2, S // 2]], np.float32),
                        labels=np.array([1]))
    B = len(state["obj_ids"])
    spec = pred._session_spec(state)
    bank0 = pred._make_bank(spec, B)
    out, bank0 = pred._run_prompt_frame(state, bank0, 0, spec)
    bank0 = jax.block_until_ready(bank0)
    images = state["images"]
    pos_kcache = (sam2_model.make_pos_kcache(params, cfg, spec)
                  if pred.use_kcache else None)
    from medsam2_tpu.core.hiera import _get_pos_embed
    trunk_pe = _get_pos_embed(params["image_encoder"]["trunk"], S // 4, S // 4)
    kw = dict(spec=spec, is_eval=True, num_frames=T, track_in_reverse=False)

    # ---- FULL: the production segmented scan
    def build_full(n):
        order = jnp.arange(1, n + 1, dtype=jnp.int32)

        def run():
            return pred._scan_run(pred.params, images, bank0, order,
                                  pos_kcache, **kw)[0]
        return run

    # ---- NOSLICE: fixed pre-cast frame, body otherwise identical
    frame_b = jnp.asarray(video[1:2]).astype(jnp.bfloat16)

    def build_noslice(n):
        @jax.jit
        def run_jit(frame, bank0):
            def body(bank, frame_idx):
                feats, pos = _encode_frame(pred.params, frame, cfg=cfg,
                                           trunk_pos_embed=trunk_pe)
                feats, pos = _expand_to_objects(feats, pos, B)
                o, bank = sam2_model.track_step(
                    pred.params, cfg, spec, bank, frame_idx,
                    is_init_cond_frame=False,
                    current_vision_feats=feats, current_vision_pos=pos,
                    point_inputs=None, mask_inputs=None,
                    multimask_output=False, run_mem_encoder=True,
                    is_cond_frame=False, num_frames=T, is_eval=True,
                    pos_kcache=pos_kcache)
                return bank, o["pred_masks"].astype(jnp.float32)
            bank, masks = jax.lax.scan(body, bank0,
                                       jnp.arange(1, n + 1, dtype=jnp.int32))
            return masks
        return lambda: run_jit(frame_b, bank0)

    # ---- TRACK_KC: track-only on fixed features, kcache bank
    frame0 = jax.lax.dynamic_index_in_dim(images, 1, 0, keepdims=True)
    feats0, pos0 = _encode_frame(pred.params, frame0, cfg=cfg,
                                 trunk_pos_embed=trunk_pe)
    feats0, pos0 = _expand_to_objects(feats0, pos0, B)
    feats0 = jax.block_until_ready(feats0)

    def build_track(n):
        @jax.jit
        def run_jit(feats0, bank0):
            def body(bank, t):
                o, bank = sam2_model.track_step(
                    pred.params, cfg, spec, bank, t,
                    is_init_cond_frame=False,
                    current_vision_feats=feats0, current_vision_pos=pos0,
                    point_inputs=None, mask_inputs=None,
                    multimask_output=False, run_mem_encoder=True,
                    is_cond_frame=False, num_frames=T, is_eval=True,
                    pos_kcache=pos_kcache)
                return bank, o["pred_masks"].astype(jnp.float32)
            bank, masks = jax.lax.scan(body, bank0,
                                       jnp.arange(1, n + 1, dtype=jnp.int32))
            return masks
        return lambda: run_jit(feats0, bank0)

    # ---- ENC: encoder-only over sliced frames
    def build_enc(n):
        @jax.jit
        def run_jit(imgs):
            def body(c, t):
                frame = jax.lax.dynamic_index_in_dim(imgs, t, 0, keepdims=True)
                feats, _ = _encode_frame(pred.params, frame, cfg=cfg,
                                         trunk_pos_embed=trunk_pe)
                return c + jnp.sum(feats[-1]).astype(jnp.float32), 0
            c, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(1, n + 1, dtype=jnp.int32))
            return c
        return lambda: run_jit(images)

    tF = slope(build_full, "FULL")
    tN = slope(build_noslice, "NOSLICE")
    tT = slope(build_track, "TRACK_KC")
    tE = slope(build_enc, "ENC")
    print(f"\nslice+cast      : {(tF-tN)*1e3:7.3f} ms/frame")
    print(f"fusion loss     : {(tN-tT-tE)*1e3:7.3f} ms/frame "
          f"(NOSLICE - TRACK_KC - ENC)")
    print(f"kcache track    : {tT*1e3:7.3f} vs components 4.18", flush=True)


if __name__ == "__main__":
    main()

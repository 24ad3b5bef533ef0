"""Attribute the propagation-scan overhead: bench-implied ms/frame minus the
isolated encoder+track components. Times three scans at two trip counts:

  A. the real predictor scan body (encode frame_t -> track -> store mask)
  B. same but always tracking a FIXED pre-encoded feature set (no per-frame
     image slice / encoder)
  C. encoder-only over sliced frames

glue = A - B - C isolates what the full body adds over its two halves
(dynamic slice, lax.cond, mask store, lost cross-component fusion).
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
from medsam2_tpu.state import memory_bank as mb
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


def slope(build_run):
    t1 = timed_n(build_run, N1)
    t2 = timed_n(build_run, N2)
    print(f"    raw: t{N1}={t1*1e3:8.2f} ms  t{N2}={t2*1e3:8.2f} ms", flush=True)
    return (t2 - t1) / (N2 - N1)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    pred = SAM2VideoPredictor(params, cfg, max_cond_frames=1)
    rng = np.random.default_rng(0)

    T = N2
    video = (rng.random((T, S, S, 3)) * 255).astype(np.float32)
    state = pred.init_state(images=video)
    pred.add_new_points(state, frame_idx=0, obj_id=0,
                        points=np.array([[S // 2, S // 2]], np.float32),
                        labels=np.array([1]))
    B = len(state["obj_ids"])
    spec = pred._session_spec(state)
    bank0 = pred._make_bank(spec, B)   # incl. kcache slots, as the bench does
    out, bank0 = pred._run_prompt_frame(state, bank0, 0, spec)
    h4 = cfg.low_res_mask_size
    images = state["images"]

    # ---- A: real (segmented, branch-free) scan body
    pos_kcache = (sam2_model.make_pos_kcache(pred.params, cfg, spec)
                  if pred.use_kcache else None)

    def build_A(n):
        order = jnp.arange(1, n + 1, dtype=jnp.int32)

        def run():
            return pred._scan_run(
                pred.params, images, bank0, order, pos_kcache,
                spec=spec, is_eval=True, num_frames=T, track_in_reverse=False)[0]
        return run

    # ---- C: encoder-only scan over sliced frames
    from medsam2_tpu.core.hiera import _get_pos_embed
    trunk_pe = _get_pos_embed(params["image_encoder"]["trunk"], S // 4, S // 4)

    def build_C(n):
        @jax.jit
        def run_jit(imgs):
            def body(c, t):
                frame = jax.lax.dynamic_index_in_dim(imgs, t, 0, keepdims=True)
                feats, _ = _encode_frame(pred.params, frame, cfg=cfg,
                                         trunk_pos_embed=trunk_pe)
                return c + jnp.sum(feats[-1]).astype(jnp.float32), 0
            c, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(n, dtype=jnp.int32))
            return c
        return lambda: run_jit(images)

    # ---- B: track-only scan on fixed features (bank still carried)
    frame0 = jax.lax.dynamic_index_in_dim(images, 0, 0, keepdims=True)
    feats0, pos0 = _encode_frame(pred.params, frame0, cfg=cfg,
                                 trunk_pos_embed=trunk_pe)
    feats0, pos0 = _expand_to_objects(feats0, pos0, B)
    feats0 = jax.block_until_ready(feats0)

    def build_B(n):
        @jax.jit
        def run_jit(feats0, bank0):
            def body(bank, t):
                out, bank = sam2_model.track_step(
                    pred.params, cfg, spec, bank, t,
                    is_init_cond_frame=False,
                    current_vision_feats=feats0, current_vision_pos=pos0,
                    point_inputs=None, mask_inputs=None,
                    multimask_output=False, run_mem_encoder=True,
                    is_cond_frame=False, num_frames=T, is_eval=True)
                return bank, out["pred_masks"].astype(jnp.float32)
            bank, masks = jax.lax.scan(body, bank0,
                                       jnp.arange(1, n + 1, dtype=jnp.int32))
            return masks
        return lambda: run_jit(feats0, bank0)

    tC = slope(build_C)
    print(f"C encoder-only scan : {tC*1e3:7.3f} ms/frame", flush=True)
    tB = slope(build_B)
    print(f"B track-only scan   : {tB*1e3:7.3f} ms/frame", flush=True)
    tA = slope(build_A)
    print(f"A full predictor    : {tA*1e3:7.3f} ms/frame", flush=True)
    print(f"glue = A - B - C    : {(tA-tB-tC)*1e3:7.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()

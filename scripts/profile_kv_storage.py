"""A/B the storage-order kv-cache readout against the recency-gather path.

Times the branch-free propagation scan (`_scan_track_run`) back-to-back with
`kv_storage` off (read-order `k_cache`, the round-3 default) and on (storage
order + the Pallas `kv_cached_attention` kernel) in ONE process, slope-timed
between two frame counts so the ~27 ms tunnel RTT and per-call dispatch floor
cancel (CLAUDE.md: never trust single-trip timings over the tunnel).

Usage: python scripts/profile_kv_storage.py [image_size] [preset]
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
from medsam2_tpu.api.video_predictor import SAM2VideoPredictor


def build(S, preset):
    cfg = get_config(preset, image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    pred = SAM2VideoPredictor(params, cfg, max_cond_frames=1)
    rng = np.random.default_rng(0)
    T = 33  # scan lengths 16 and 32 share the video
    video = (rng.random((T, S, S, 3)) * 255).astype(np.float32)
    state = pred.init_state(images=video)
    pred.add_new_points(state, frame_idx=0, obj_id=0,
                        points=np.array([[S // 2, S // 2]], np.float32),
                        labels=np.array([1]))
    B = len(state["obj_ids"])
    spec = pred._session_spec(state)
    bank = pred._make_bank(spec, B)
    out, bank = pred._run_prompt_frame(state, bank, 0, spec)
    pos_kcache = (sam2_model.make_pos_kcache(params, cfg, spec)
                  if pred.use_kcache else None)
    return pred, state, spec, bank, pos_kcache, T


def time_scan(pred, state, spec, bank, pos_kcache, T, n_frames, kv_storage,
              reps=4):
    order = np.arange(1, 1 + n_frames, dtype=np.int32)
    kw = dict(spec=spec, is_eval=True, num_frames=T, track_in_reverse=False,
              kv_storage=kv_storage)
    args = (pred.params, state["images"], bank, jnp.asarray(order), pos_kcache)
    m, _ = pred._scan_run(*args, **kw)
    jax.block_until_ready(m)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        m, _ = pred._scan_run(*args, **kw)
        float(jnp.sum(m))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    preset = sys.argv[2] if len(sys.argv) > 2 else "sam2_hiera_t"
    print(f"backend={jax.default_backend()} S={S} preset={preset}", flush=True)
    pred, state, spec, bank, pos_kcache, T = build(S, preset)
    for kv_storage in (False, True, False, True):
        t16 = time_scan(pred, state, spec, bank, pos_kcache, T, 16, kv_storage)
        t32 = time_scan(pred, state, spec, bank, pos_kcache, T, 32, kv_storage)
        per = (t32 - t16) / 16.0
        print(f"kv_storage={int(kv_storage)}: 16f {t16*1e3:8.2f} ms  "
              f"32f {t32*1e3:8.2f} ms  slope {per*1e3:7.3f} ms/frame  "
              f"({1.0/per:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: 3D memory-bank propagation throughput (frames/sec/chip).

The headline metric from BASELINE.md: video/volume propagation at 1024 px
through the full per-frame pipeline (Hiera encoder -> memory attention over the
ring-buffer bank -> SAM heads -> memory encoder + bank write), batched objects,
on one chip. ``vs_baseline`` compares against the upstream SAM2 code comment's
GPU tracking throughput (27 fps at 768 px, 1 object —
``sam2_train/sam2_video_predictor.py:60-62``), the only quantitative trace the
reference publishes.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "1024"))
    num_frames = int(os.environ.get("BENCH_FRAMES", "16"))
    num_obj = int(os.environ.get("BENCH_OBJECTS", "1"))
    preset = os.environ.get("BENCH_PRESET", "sam2_hiera_t")

    import jax
    import jax.numpy as jnp
    from medsam2_tpu.configs import get_config
    from medsam2_tpu.core.sam2_model import sam2_init
    from medsam2_tpu.api.video_predictor import SAM2VideoPredictor

    cfg = get_config(preset, image_size=image_size)
    params = sam2_init(jax.random.PRNGKey(0), cfg)
    pred = SAM2VideoPredictor(params, cfg, max_cond_frames=2)

    rng = np.random.default_rng(0)
    video = (rng.random((num_frames, image_size, image_size, 3)) * 255).astype(np.float32)
    state = pred.init_state(images=video)
    for o in range(num_obj):
        pred.add_new_points(
            state, frame_idx=0, obj_id=o,
            points=np.array([[image_size // 2 + 10 * o, image_size // 2]], np.float32),
            labels=np.array([1]))

    # warm-up (compile)
    frames, masks = pred.propagate_in_video_batch(state)
    jax.block_until_ready(masks)

    # timed runs
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        frames, masks = pred.propagate_in_video_batch(state)
        jax.block_until_ready(masks)
    dt = (time.perf_counter() - t0) / n_rep

    fps = num_frames / dt
    baseline_fps = 27.0  # upstream comment, 768px GPU tracking
    print(json.dumps({
        "metric": f"3d_propagation_fps_{preset}_{image_size}px_{num_obj}obj",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()

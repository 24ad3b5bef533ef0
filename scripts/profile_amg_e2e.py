import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax
from medsam2_tpu.configs import get_config
from medsam2_tpu.core import sam2_model
from medsam2_tpu.api import automatic_mask_generator as amg_mod
from medsam2_tpu.api.automatic_mask_generator import SAM2AutomaticMaskGenerator

cfg = get_config("sam2_hiera_t", image_size=1024)
params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
gen = SAM2AutomaticMaskGenerator(params, cfg, points_per_side=32)
rng = np.random.default_rng(0)
yy, xx = np.mgrid[0:1024, 0:1024]
img = np.zeros((1024, 1024, 3), np.float32)
for _ in range(24):
    cy, cx = rng.integers(0, 1024, 2)
    r = rng.integers(20, 120)
    blob = ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r)[..., None]
    img = np.where(blob, rng.random(3, np.float32) * 255, img)
img = np.clip(img + rng.normal(0, 8, img.shape), 0, 255).astype(np.uint8)

gen.generate(img)  # warmup/compile

import cProfile, pstats, io
pr = cProfile.Profile()
t0 = time.perf_counter()
pr.enable()
gen.generate(img)
pr.disable()
print("total", time.perf_counter() - t0, flush=True)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
print(s.getvalue()[:4000], flush=True)

"""Block-by-block slope profile of Hiera blocks 0..4 @1024 (stage2 deep dive).

Stage2 measured 2.61 ms for ~33 GF (13 TF/s) while stage3 runs 147 TF/s —
this separates block1 (q-pool transition 256^2, 96->192, ws8) from block2
(128^2, C192, ws4, seq-16 windows) from block3 (q-pool, 128^2, 192->384).

Usage: python -u scripts/profile_stage2.py [image_size]
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
from medsam2_tpu.core.hiera import _block_apply, _get_pos_embed, _patch_embed_wfold

N_SHORT, N_LONG = 8, 40


def timed(fn, carry0):
    ts = {}
    for n in (N_SHORT, N_LONG):
        @jax.jit
        def run(c, n=n):
            def body(c, _):
                return fn(c), 0
            c, _ = jax.lax.scan(body, c, None, length=n)
            return c

        jax.block_until_ready(run(carry0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(carry0))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    trunk = params["image_encoder"]["trunk"]
    tcfg = cfg.trunk
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), jnp.bfloat16)
    pe = _get_pos_embed(trunk, S // 4, S // 4)
    schedule = tcfg.block_schedule()

    def upto(k):
        def fn(c):
            x = _patch_embed_wfold(trunk["patch_embed"]["proj"],
                                   frame + c.astype(frame.dtype) * 0)
            x = x + pe.astype(x.dtype)
            for i in range(k):
                x = _block_apply(trunk["blocks"][i], x, schedule[i])
            return jnp.sum(x).astype(jnp.float32)
        return fn

    times = {}
    prev = 0.0
    for k in range(0, 6):
        times[k] = timed(upto(k), jnp.float32(0))
        lab = "patch_embed+pos" if k == 0 else f"block {k-1} {schedule[k-1]}"
        print(f"cum {times[k]*1e3:7.3f} ms  (+{(times[k]-prev)*1e3:6.3f})  {lab}",
              flush=True)
        prev = times[k]


if __name__ == "__main__":
    main()

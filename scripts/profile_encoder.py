"""Hiera encoder stage-by-stage profile on the real TPU (slope harness).

Times the trunk truncated after each stage (+ patch embed alone, + neck),
so per-stage cost = difference of cumulative times.

Usage: python -u scripts/profile_encoder.py [image_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import get_config
from medsam2_tpu.core import layers, sam2_model
from medsam2_tpu.core.hiera import (_block_apply, _get_pos_embed,
                                    _patch_embed_s2d)

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
            # keep the carry in the frame dtype (a fp32 carry would promote
            # the whole trunk to fp32)
            x = _patch_embed_s2d(trunk["patch_embed"]["proj"],
                                 frame + c.astype(frame.dtype) * 0, tcfg)
            x = x + pe.astype(x.dtype)
            for i in range(k):
                x = _block_apply(trunk["blocks"][i], x, schedule[i])
            return jnp.sum(x).astype(jnp.float32)
        return fn

    cuts = [0] + [e + 1 for e in tcfg.stage_ends]
    times = {}
    for k in cuts:
        times[k] = timed(upto(k), jnp.float32(0))
        print(f"through block {k:2d}: {times[k]*1e3:7.3f} ms", flush=True)

    prev = 0
    labels = ["patch_embed+pos"] + [
        f"stage{i+1} ({tcfg.stages[i]} blk, ws={tcfg.window_spec[i]})"
        for i in range(4)]
    for lab, k in zip(labels, cuts):
        print(f"{lab:28s} {(times[k]-times.get(prev, 0) if k else times[0])*1e3:7.3f} ms",
              flush=True)
        prev = k

    # full encoder incl. neck for reference
    def full(c):
        from medsam2_tpu.api.video_predictor import _encode_frame
        f, _ = _encode_frame(params, (frame + c * 0).astype(jnp.float32),
                             cfg=cfg, trunk_pos_embed=pe)
        return jnp.sum(f[-1]).astype(jnp.float32)
    t = timed(full, jnp.float32(0))
    print(f"{'full encoder + neck':28s} {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

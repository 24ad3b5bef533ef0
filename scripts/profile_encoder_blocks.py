"""Cumulative per-block slope profile of the FULL Hiera trunk under the
production lowering (hiera_apply itself, so MEDSAM2_CHAIN_WINDOWS /
MEDSAM2_SPLIT_QKV defaults apply), prefix-truncated per block.

Usage: python -u scripts/profile_encoder_blocks.py [image_size]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import get_config
from medsam2_tpu.core import sam2_model, hiera
from medsam2_tpu.core.hiera import _get_pos_embed

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
    depth = len(schedule)

    def upto(k):
        # truncate the trunk to its first k blocks but keep hiera_apply's
        # chain logic by slicing params/schedule through a shim config
        def fn(c):
            import dataclasses
            sub = {**trunk, "blocks": trunk["blocks"][:k]}
            scfg = dataclasses.replace(
                tcfg, stages=tcfg.stages)  # schedule sliced below
            outs = _hiera_prefix(sub, scfg, frame + c.astype(frame.dtype) * 0,
                                 pe, k)
            return jnp.sum(outs).astype(jnp.float32)
        return fn

    def _hiera_prefix(sub, scfg, x, pos, k):
        # inline hiera_apply with the block loop cut at k (keeps chaining)
        from medsam2_tpu.core import layers
        x = hiera._patch_embed_wfold(sub["patch_embed"]["proj"], x)
        x = x + pos.astype(x.dtype)
        chain = hiera._chain_windows_enabled()
        wins = None
        cur_ws = cur_hw = None
        acc = jnp.float32(0)
        for i, (bp, spec) in enumerate(zip(sub["blocks"], schedule[:k])):
            ws = spec["window_size"]
            if chain and ws > 0:
                if wins is not None and cur_ws != ws:
                    x = layers.window_unpartition(wins, cur_ws, cur_hw, cur_hw)
                    wins = None
                if wins is None:
                    H, W = x.shape[1], x.shape[2]
                    if H % ws == 0 and W % ws == 0:
                        wins, _ = layers.window_partition(x, ws)
                        cur_hw = (H, W)
                if wins is not None:
                    wins = hiera._block_apply_windows(bp, wins, spec)
                    cur_ws = wins.shape[1]
                    if spec["q_stride"] is not None:
                        cur_hw = (cur_hw[0] // spec["q_stride"][0],
                                  cur_hw[1] // spec["q_stride"][1])
                    continue
            if wins is not None:
                x = layers.window_unpartition(wins, cur_ws, cur_hw, cur_hw)
                wins = None
            x = hiera._block_apply(bp, x, spec)
        if wins is not None:
            x = layers.window_unpartition(wins, cur_ws, cur_hw, cur_hw)
        return jnp.sum(x)

    prev = 0.0
    for k in range(0, depth + 1):
        t = timed(upto(k), jnp.float32(0))
        lab = "patch_embed+pos" if k == 0 else (
            f"block {k-1} ws{schedule[k-1]['window_size']}"
            f" d{schedule[k-1]['dim']}->{schedule[k-1]['dim_out']}"
            f"{' POOL' if schedule[k-1]['q_stride'] else ''}")
        print(f"cum {t*1e3:7.3f} ms  (+{(t-prev)*1e3:6.3f})  {lab}", flush=True)
        prev = t


if __name__ == "__main__":
    main()

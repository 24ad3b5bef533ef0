"""Iterate on the fused window-attention kernel against the XLA path.

Times, per hiera_t @1024 windowed-block shape, the full attention sub-block
(layernorm'd x -> qkv linear -> window attention -> proj) for:
- the XLA path (partition -> per-window SDPA -> unpartition), and
- the Pallas fused kernel (pad -> qkv -> kernel -> slice).

Slope timing over two scan lengths cancels the tunnel RTT.

Usage: python -u scripts/sweep_fused_window.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.core import layers
from medsam2_tpu.ops.attention import sdpa_xla
from medsam2_tpu.ops import window_attention as wa

N_SHORT, N_LONG = 8, 40

# (name, H, W, C, ws, heads) for hiera_t @1024's non-pooled windowed blocks
SHAPES = [
    ("stage1", 256, 256, 96, 8, 1),
    ("stage2", 128, 128, 192, 4, 2),
    ("stage3", 64, 64, 384, 14, 4),
    ("stage4", 32, 32, 768, 7, 8),
]


def timed(fn, x):
    ts = {}
    for n in (N_SHORT, N_LONG):
        @jax.jit
        def run(c, n=n):
            def body(c, _):
                return fn(c), 0
            c, _ = jax.lax.scan(body, c, None, length=n)
            return c
        out = run(x)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(x)))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT)


def xla_block(x, qkv_p, proj_p, ws, heads, C):
    xw, pad_hw = layers.window_partition(x, ws)
    B_, h_, w_, _ = xw.shape
    qkv = layers.linear_apply(qkv_p, xw.reshape(B_, h_ * w_, C))
    qkv = qkv.reshape(B_, h_ * w_, 3, heads, C // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    out = sdpa_xla(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                   v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    out = out.reshape(B_, ws, ws, C)
    out = layers.window_unpartition(out, ws, pad_hw, (x.shape[1], x.shape[2]))
    return layers.linear_apply(proj_p, out)


def fused_block(x, qkv_p, proj_p, ws, heads, C, version):
    H, W = x.shape[1], x.shape[2]
    ph = (ws - H % ws) % ws
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, ph), (0, 0))) if ph else x
    qkv = layers.linear_apply(qkv_p, xp)
    out = version(qkv, heads, ws)
    if ph:
        out = out[:, :H, :W]
    return layers.linear_apply(proj_p, out)


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    for name, H, W, C, ws, heads in SHAPES:
        x = jnp.asarray(rng.standard_normal((1, H, W, C)), dt)
        qkv_p = {k: v.astype(jnp.float32) for k, v in
                 layers.linear_init(jax.random.PRNGKey(0), C, 3 * C).items()}
        proj_p = layers.linear_init(jax.random.PRNGKey(1), C, C)

        t_xla = timed(lambda c: xla_block(c, qkv_p, proj_p, ws, heads, C), x)
        line = f"{name:8s} ws={ws:2d} h={heads} : xla {t_xla*1e3:7.3f} ms"
        for vname, fn in [("v1", wa.window_attention),
                          ("v2", wa.window_attention_v2)]:
            try:
                t = timed(lambda c: fused_block(c, qkv_p, proj_p, ws, heads, C, fn), x)
                line += f" | {vname} {t*1e3:7.3f} ms"
            except Exception as e:
                line += f" | {vname} FAIL({type(e).__name__})"
        print(line, flush=True)


if __name__ == "__main__":
    main()

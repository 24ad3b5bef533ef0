"""Shared scan-slope timer for the TPU profiling scripts.

Times ``jit(scan(fn))`` at two trip counts and returns the per-iteration
SLOPE, so the ~27 ms tunnel round-trip (dispatch + scalar pull) cancels
exactly. ``fn`` must thread the carry into its computation (``x +
c.astype(x.dtype) * 0`` — keep the carry in the data dtype, or fp32 promotion
corrupts the measurement) and return a scalar.
"""

import time

import jax
import jax.numpy as jnp

N1, N2 = 8, 40


def timed(fn, carry0, n1: int = N1, n2: int = N2, repeats: int = 3):
    ts = {}
    for n in (n1, n2):
        @jax.jit
        def run(c, n=n):
            def body(c, _):
                return fn(c), 0
            c, _ = jax.lax.scan(body, c, None, length=n)
            return c

        jax.block_until_ready(run(carry0))
        best = 1e9
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(jnp.sum(run(carry0)).astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n2] - ts[n1]) / (n2 - n1)

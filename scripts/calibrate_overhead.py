"""Calibrate timing on the axon TPU tunnel.

Round 1 findings: a `c*0` carry lets XLA hoist the op out of the scan, and the
python-visible call floor (dispatch + scalar pull over the tunnel) is ~30 ms,
so per-iter numbers at small N are inflated. This harness:

- measures the empty-scan total at N=64 vs N=512 (RTT-dominated if ~equal),
- uses GENUINE loop-carried dependencies (the op output feeds the next input
  through a normalization, so nothing is loop-invariant),
- reports (total(N2) - total(N1)) / (N2 - N1): the RTT-free per-iter cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.ops.attention import flash_attention, sdpa_xla

N1, N2 = 64, 256


def _norm(y, like):
    y = y.astype(jnp.float32)
    return (y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)).astype(like.dtype)


def timed(build_body, carry0):
    """build_body: carry -> carry with genuine dependence. Returns per-iter
    seconds measured as the N2-N1 slope (RTT and dispatch cancel)."""
    ts = {}
    for n in (N1, N2):
        @jax.jit
        def run(c):
            def body(c, _):
                return build_body(c), 0
            c, _ = jax.lax.scan(body, c, None, length=n)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x).astype(jnp.float32), c, 0.0)

        jax.block_until_ready(run(carry0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(carry0))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[N2] - ts[N1]) / (N2 - N1), ts


def main():
    rng = np.random.default_rng(0)

    t, ts = timed(lambda c: c + 1.0, jnp.float32(0))
    print(f"empty scan           {t*1e6:9.1f} us/iter (N64 {ts[N1]*1e3:.1f} ms, "
          f"N256 {ts[N2]*1e3:.1f} ms)", flush=True)

    w = jnp.asarray(rng.standard_normal((256, 256)) * 0.06, jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((4096, 256)), jnp.bfloat16)
    t, _ = timed(lambda x: _norm(
        jnp.matmul(x, w, preferred_element_type=jnp.float32), x), x0)
    print(f"matmul 4096x256x256  {t*1e6:9.1f} us/iter "
          f"({2*4096*256*256/t/1e12:6.1f} TF/s)", flush=True)

    bw = jnp.asarray(rng.standard_normal((2048, 2048)) * 0.02, jnp.bfloat16)
    bx = jnp.asarray(rng.standard_normal((8192, 2048)), jnp.bfloat16)
    t, _ = timed(lambda x: _norm(
        jnp.matmul(x, bw, preferred_element_type=jnp.float32), x), bx)
    print(f"matmul 8192x2048^2   {t*1e6:9.1f} us/iter "
          f"({2*8192*2048*2048/t/1e12:6.1f} TF/s)", flush=True)

    def attn_bench(name, nq, nk, d, h, fn):
        q0 = jnp.asarray(rng.standard_normal((1, h, nq, d)), jnp.bfloat16)
        k0 = jnp.asarray(rng.standard_normal((1, h, nk, d)), jnp.bfloat16)
        flops = 2 * 2 * h * nq * nk * d
        t, _ = timed(lambda q: _norm(fn(q, k0, k0), q), q0)
        print(f"{name:20s} {t*1e6:9.1f} us/iter ({flops/t/1e12:6.1f} TF/s)",
              flush=True)

    attn_bench("self flash 1024/512", 4096, 4096, 256, 1,
               lambda q, k, v: flash_attention(q, k, v, block_q=1024, block_k=512))
    attn_bench("self xla", 4096, 4096, 256, 1, sdpa_xla)
    attn_bench("cross flash 512/512", 4096, 28736, 256, 1,
               lambda q, k, v: flash_attention(q, k, v, block_q=512, block_k=512))
    attn_bench("cross flash 2048/512", 4096, 28736, 256, 1,
               lambda q, k, v: flash_attention(q, k, v, block_q=2048, block_k=512))
    attn_bench("cross xla", 4096, 28736, 256, 1, sdpa_xla)
    attn_bench("encglob flash 512/1024", 4096, 4096, 96, 4,
               lambda q, k, v: flash_attention(q, k, v, block_q=512, block_k=1024))
    attn_bench("encglob xla", 4096, 4096, 96, 4, sdpa_xla)


if __name__ == "__main__":
    main()

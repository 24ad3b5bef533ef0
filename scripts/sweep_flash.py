"""Flash-attention block-size sweep on the real TPU for the three hot shapes:
memory cross-attention, memory self-attention, encoder global attention.

Usage: python -u scripts/sweep_flash.py [image_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.ops.attention import flash_attention, sdpa_xla

N_ITERS = 32


def bench(fn, *args):
    @jax.jit
    def run(a0, rest):
        def body(c, _):
            return jnp.sum(fn(a0 + c * 0, *rest)).astype(jnp.float32), 0
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N_ITERS)
        return c

    out = run(args[0], args[1:])
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(args[0], args[1:]))
        best = min(best, time.perf_counter() - t0)
    return best / N_ITERS


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    s = S // 16
    rng = np.random.default_rng(0)
    shapes = {
        # (name, q shape, kv shape)
        "cross": ((1, 1, s * s, 256), (1, 1, 7 * s * s + 64, 256)),
        "self": ((1, 1, s * s, 256), (1, 1, s * s, 256)),
        "enc_global": ((1, 4, s * s, 96), (1, 4, s * s, 96)),
    }
    for name, (qs, ks) in shapes.items():
        q = jnp.asarray(rng.standard_normal(qs), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal(ks), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal(ks), jnp.bfloat16)
        flops = 2 * 2 * qs[0] * qs[1] * qs[2] * ks[2] * qs[3]
        t = bench(lambda q_, k_, v_: sdpa_xla(q_, k_, v_), q, k, v)
        print(f"{name:10s} xla          {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s",
              flush=True)
        for bq, bk in ((256, 512), (512, 512), (512, 1024), (1024, 512),
                       (1024, 1024), (2048, 512)):
            try:
                t = bench(lambda q_, k_, v_, bq=bq, bk=bk: flash_attention(
                    q_, k_, v_, block_q=bq, block_k=bk), q, k, v)
                print(f"{name:10s} flash {bq:4d}/{bk:<4d} {t*1e3:7.3f} ms  "
                      f"{flops/t/1e12:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"{name:10s} flash {bq:4d}/{bk:<4d} FAILED: "
                      f"{type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()

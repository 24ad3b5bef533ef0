"""Isolated memory cross-attention flash kernel: Dv=256 vs Dv=64 (low-rank
value path) at the real @1024 geometry, plus block sweeps."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import timed, N1, N2  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.ops.attention import flash_attention


def main():
    rng = np.random.default_rng(0)
    Nq, Nk, D = 4096, 7 * 4096 + 64, 256
    q = jnp.asarray(rng.standard_normal((1, 1, Nq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 1, Nk, D)), jnp.bfloat16)
    v256 = jnp.asarray(rng.standard_normal((1, 1, Nk, D)), jnp.bfloat16)
    v64 = jnp.asarray(rng.standard_normal((1, 1, Nk, 64)), jnp.bfloat16)
    wv = jnp.asarray(rng.standard_normal((64, 256)) * 0.05, jnp.bfloat16)
    mask = jnp.ones((1, Nk), bool)

    def dep(c, x=q):
        return x + c.astype(x.dtype) * 0

    for bq, bk in [(2048, 512), (1024, 512), (512, 512), (1024, 1024), (2048, 1024)]:
        for tag, v in [("dv256", v256), ("dv64 ", v64)]:
            def f(c, v=v, bq=bq, bk=bk):
                o = flash_attention(dep(c), k, v, kv_mask=mask,
                                    block_q=bq, block_k=bk)
                return jnp.sum(o).astype(jnp.float32)
            try:
                t = timed(f, jnp.float32(0))
                gf = (2 * Nq * Nk * D + 2 * Nq * Nk * v.shape[-1]) / 1e9
                print(f"bq={bq:4d} bk={bk:4d} {tag}: {t*1e3:7.3f} ms "
                      f"({gf/t/1e3:6.1f} TF/s model-GF)", flush=True)
            except Exception as e:
                print(f"bq={bq:4d} bk={bk:4d} {tag}: FAIL {type(e).__name__}", flush=True)

    # full factored pipeline: flash dv64 + output projection
    def f2(c):
        o = flash_attention(dep(c), k, v64, kv_mask=mask, block_q=2048, block_k=512)
        return jnp.sum(jnp.matmul(o[0, 0], wv)).astype(jnp.float32)
    t = timed(f2, jnp.float32(0))
    print(f"dv64 + out-proj (2048/512): {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

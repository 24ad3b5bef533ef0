"""Memory cross-attention at the 512-px streaming geometry (q=1024,
kv=7*1024+64): flash (several blocks) vs the XLA SDPA path — decides the
``_use_flash`` gate for BASELINE config 5 (VERDICT r2 #5)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import timed  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.ops.attention import flash_attention, sdpa_xla


def main():
    rng = np.random.default_rng(0)
    Nq, Nk, D = 1024, 7 * 1024 + 64, 256
    B = int(os.environ.get("PROF_BATCH", "1"))  # batched volumes stream B>1
    q = jnp.asarray(rng.standard_normal((B, 1, Nq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, 1, Nk, D)), jnp.bfloat16)
    v64 = jnp.asarray(rng.standard_normal((B, 1, Nk, 64)), jnp.bfloat16)
    mask = jnp.ones((B, Nk), bool)
    gf = B * (2 * Nq * Nk * D + 2 * Nq * Nk * 64) / 1e9

    def dep(c):
        return q + c.astype(q.dtype) * 0

    def xla(c):
        return jnp.sum(sdpa_xla(dep(c), k, v64, kv_mask=mask)).astype(jnp.float32)

    t = timed(xla, jnp.float32(0))
    print(f"B={B} xla            : {t*1e3:7.3f} ms ({gf/t/1e3:6.1f} TF/s)", flush=True)

    for bq, bk in [(1024, 512), (512, 512), (1024, 1024), (512, 1024)]:
        def f(c, bq=bq, bk=bk):
            o = flash_attention(dep(c), k, v64, kv_mask=mask,
                                block_q=bq, block_k=bk)
            return jnp.sum(o).astype(jnp.float32)
        try:
            t = timed(f, jnp.float32(0))
            print(f"B={B} flash bq={bq:4d} bk={bk:4d}: {t*1e3:7.3f} ms "
                  f"({gf/t/1e3:6.1f} TF/s)", flush=True)
        except Exception as e:
            print(f"B={B} flash bq={bq} bk={bk}: FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()

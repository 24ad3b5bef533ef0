"""Windowed-attention lowering variants at Hiera geometries @1024.

Current path: sdpa_xla on [G, nh, n, 96] with fp32 logits. Variants probe
whether the ~0.9 ms of windowed attention is exp-, layout-, or dtype-bound.
"""

import os
import sys
import time
import math

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import timed, N1, N2  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.ops.attention import sdpa_xla


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    # (G, nh, n, d): stage1, stage2, stage3-windowed, stage4
    shapes = [(1024, 1, 64, 96), (1024, 2, 16, 96), (25, 4, 196, 96),
              (25, 8, 49, 96)]
    for G, nh, n, d in shapes:
        q = jnp.asarray(rng.standard_normal((G, nh, n, d)), dt)
        k = jnp.asarray(rng.standard_normal((G, nh, n, d)), dt)
        v = jnp.asarray(rng.standard_normal((G, nh, n, d)), dt)
        scale = 1.0 / math.sqrt(d)
        print(f"\n[G={G} nh={nh} n={n} d={d}]", flush=True)

        def dep(c, x=q):
            return x + c.astype(x.dtype) * 0

        t = timed(lambda c: jnp.sum(sdpa_xla(dep(c), k, v)).astype(jnp.float32),
                  jnp.float32(0))
        print(f"  sdpa_xla (f32 softmax)   : {t*1e3:7.3f} ms", flush=True)

        def bf16_softmax(c):
            qq = dep(c)
            s = jnp.einsum("bhqd,bhkd->bhqk", qq, k) * scale     # bf16 logits
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(dt)
            return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v)).astype(jnp.float32)
        t = timed(bf16_softmax, jnp.float32(0))
        print(f"  bf16 logits, f32 softmax : {t*1e3:7.3f} ms", flush=True)

        def all_bf16(c):
            qq = dep(c)
            s = jnp.einsum("bhqd,bhkd->bhqk", qq, k) * scale
            m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
            e = jnp.exp((s - m).astype(jnp.float32))
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
            return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v)).astype(jnp.float32)
        t = timed(all_bf16, jnp.float32(0))
        print(f"  bf16 logits, manual sm   : {t*1e3:7.3f} ms", flush=True)

        # fold heads into the window batch (no [B,N,h,d]->[B,h,N,d] transpose
        # needed upstream when nh>1 — measures the attention alone here)
        q2 = q.reshape(G * nh, n, d)
        k2 = k.reshape(G * nh, n, d)
        v2 = v.reshape(G * nh, n, d)

        def flat3(c):
            qq = q2 + c.astype(dt) * 0
            s = jnp.einsum("gnd,gmd->gnm", qq, k2,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1).astype(dt)
            return jnp.sum(jnp.einsum("gnm,gmd->gnd", p, v2)).astype(jnp.float32)
        t = timed(flat3, jnp.float32(0))
        print(f"  rank-3, f32 softmax      : {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

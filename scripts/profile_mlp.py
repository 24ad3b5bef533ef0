"""Why is the Hiera MLP slow? Time raw matmuls at block geometries under
different precision settings, plus the composed ln+mlp, on the real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import timed, N1, N2  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.core import layers


def main():
    rng = np.random.default_rng(0)
    for N, C in [(65536, 96), (16384, 192), (4096, 384), (1024, 768)]:
        Ci = 4 * C
        x = jnp.asarray(rng.standard_normal((N, C)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((C, Ci)) * 0.02, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((Ci, C)) * 0.02, jnp.bfloat16)
        gf = 2 * N * C * Ci * 2 / 1e9

        def dep(c, x=x):
            return x + c.astype(x.dtype) * 0

        for prec, name in [(jax.lax.Precision.HIGHEST, "HIGHEST"),
                           (jax.lax.Precision.DEFAULT, "DEFAULT")]:
            def mm(c, prec=prec):
                h = jnp.matmul(dep(c), w1, precision=prec)
                y = jnp.matmul(h, w2, precision=prec)
                return jnp.sum(y).astype(jnp.float32)
            t = timed(mm, jnp.float32(0))
            print(f"[{N:6d}x{C:4d}] mm+mm   {name}: {t*1e3:7.3f} ms "
                  f"({gf/t/1e3:6.1f} TF/s)", flush=True)

        def mm_gelu(c):
            h = layers.gelu(jnp.matmul(dep(c), w1, precision=layers.PRECISION))
            y = jnp.matmul(h, w2, precision=layers.PRECISION)
            return jnp.sum(y).astype(jnp.float32)
        t = timed(mm_gelu, jnp.float32(0))
        print(f"[{N:6d}x{C:4d}] mm+gelu+mm      : {t*1e3:7.3f} ms "
              f"({gf/t/1e3:6.1f} TF/s)", flush=True)

        ln = layers.layer_norm_init(C)
        def ln_mlp(c):
            h = layers.layer_norm_apply(ln, dep(c)[None], eps=1e-6)[0]
            h = layers.gelu(jnp.matmul(h, w1, precision=layers.PRECISION))
            y = jnp.matmul(h, w2, precision=layers.PRECISION)
            return jnp.sum(y).astype(jnp.float32)
        t = timed(ln_mlp, jnp.float32(0))
        print(f"[{N:6d}x{C:4d}] ln+mm+gelu+mm   : {t*1e3:7.3f} ms "
              f"({gf/t/1e3:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()

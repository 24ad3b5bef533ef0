"""GELU variant cost on the VPU at Hiera block geometry (the mm+gelu+mm
profile showed the erf GELU dominates MLP time)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import timed, N1, N2  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(0)
    N, C = 65536, 96
    Ci = 4 * C
    x = jnp.asarray(rng.standard_normal((N, C)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((C, Ci)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((Ci, C)) * 0.02, jnp.bfloat16)
    gf = 2 * N * C * Ci * 2 / 1e9

    def dep(c):
        return x + c.astype(x.dtype) * 0

    acts = {
        "erf exact       ": lambda h: jax.nn.gelu(h, approximate=False),
        "erf exact f32   ": lambda h: jax.nn.gelu(
            h.astype(jnp.float32), approximate=False).astype(h.dtype),
        "tanh approx     ": lambda h: jax.nn.gelu(h, approximate=True),
        "sigmoid approx  ": lambda h: h * jax.nn.sigmoid(1.702 * h.astype(jnp.float32)).astype(h.dtype),
        "relu (floor)    ": jax.nn.relu,
        "identity (floor)": lambda h: h,
    }
    for name, act in acts.items():
        def mm(c, act=act):
            h = act(jnp.matmul(dep(c), w1))
            y = jnp.matmul(h, w2)
            return jnp.sum(y).astype(jnp.float32)
        t = timed(mm, jnp.float32(0))
        print(f"mm+[{name}]+mm: {t*1e3:7.3f} ms ({gf/t/1e3:6.1f} TF/s)", flush=True)

    # accuracy of approximations vs exact erf in f32, evaluated at bf16 inputs
    h = jnp.asarray(rng.standard_normal(1 << 20) * 3, jnp.bfloat16)
    exact = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
    for name, act in [("tanh approx", lambda v: jax.nn.gelu(v, approximate=True)),
                      ("erf bf16", lambda v: jax.nn.gelu(v, approximate=False))]:
        got = act(h).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - exact)))
        # compare against bf16 quantization of the exact result
        qerr = float(jnp.max(jnp.abs(exact.astype(jnp.bfloat16).astype(jnp.float32) - exact)))
        print(f"{name}: max|err|={err:.5f}  (bf16 quantization floor {qerr:.5f})", flush=True)


if __name__ == "__main__":
    main()

"""Per-piece memory-encoder timing @1024: mask downsampler layers vs fuser vs
projections (the 0.9 ms / 11.6 GF = 6% MFU component)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import timed, N1, N2  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import get_config
from medsam2_tpu.core import layers, sam2_model
from medsam2_tpu.core.memory import _cx_block_apply


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    me = params["memory_encoder"]
    mcfg = cfg.memory_encoder
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    mask = jnp.asarray(rng.random((1, S, S, 1)), dt)

    def dep(c, x=mask):
        return x + c.astype(x.dtype) * 0

    # full downsampler
    def down(x):
        for lp in me["mask_downsampler"]:
            x = layers.conv3s2_wfold(lp["conv"], x)
            x = layers.layer_norm_2d_apply(lp["ln"], x)
            x = layers.gelu(x)
        return x

    t = timed(lambda c: jnp.sum(down(dep(c))).astype(jnp.float32), jnp.float32(0))
    print(f"mask downsampler (4 conv+ln+gelu): {t*1e3:7.3f} ms", flush=True)

    # per layer
    x = mask
    for i, lp in enumerate(me["mask_downsampler"]):
        xi = x

        def one(c, lp=lp, xi=xi):
            y = layers.conv3s2_wfold(lp["conv"], xi + c.astype(xi.dtype) * 0)
            y = layers.layer_norm_2d_apply(lp["ln"], y)
            return jnp.sum(layers.gelu(y)).astype(jnp.float32)
        t = timed(one, jnp.float32(0))
        print(f"  layer {i} {xi.shape[1]}x{xi.shape[2]}x{xi.shape[3]:3d} -> : {t*1e3:7.3f} ms", flush=True)

        def conv_only(c, lp=lp, xi=xi):
            y = layers.conv3s2_wfold(lp["conv"], xi + c.astype(xi.dtype) * 0)
            return jnp.sum(y).astype(jnp.float32)
        t = timed(conv_only, jnp.float32(0))
        print(f"    conv only                : {t*1e3:7.3f} ms", flush=True)

        def ln_gelu_only(c, lp=lp):
            y0 = layers.conv3s2_wfold(lp["conv"], xi)
            y = y0 + c.astype(y0.dtype) * 0
            y = layers.layer_norm_2d_apply(lp["ln"], y)
            return jnp.sum(layers.gelu(y)).astype(jnp.float32)
        t = timed(ln_gelu_only, jnp.float32(0))
        print(f"    ln+gelu only             : {t*1e3:7.3f} ms", flush=True)
        x = layers.conv2d_apply(lp["conv"], x, stride=(2, 2), explicit_padding=(1, 1))
        x = layers.gelu(layers.layer_norm_2d_apply(lp["ln"], x))

    s = S // 16
    feat = jnp.asarray(rng.standard_normal((1, s, s, mcfg.in_dim)), dt)
    t = timed(lambda c: jnp.sum(_cx_block_apply(
        me["fuser"][0], mcfg, feat + c.astype(dt) * 0)).astype(jnp.float32),
        jnp.float32(0))
    print(f"one CXBlock fuser @{s}x{s}x{mcfg.in_dim}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

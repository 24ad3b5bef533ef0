"""Compare patch-embed lowerings on the TPU: current space-to-depth 2x2 conv
vs the direct 7x7/stride-4 conv vs an 8x8/stride-4 zero-padded-kernel conv.

All three compute the same function (the 8x8 kernel embeds the 7x7 taps at
offset (1,1) with pad 4, exactly the derivation in hiera._patch_embed_s2d).
"""

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
from medsam2_tpu.core.hiera import _patch_embed_s2d


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    p = params["image_encoder"]["trunk"]["patch_embed"]["proj"]
    tcfg = cfg.trunk
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), jnp.bfloat16)

    def dep(c):
        return frame + c.astype(frame.dtype) * 0

    t = timed(lambda c: jnp.sum(
        _patch_embed_s2d(p, dep(c), tcfg)).astype(jnp.float32), jnp.float32(0))
    print(f"s2d 2x2 conv        {t*1e3:7.3f} ms", flush=True)

    def direct(c):
        y = layers.conv2d_apply(p if "b" in p else p, dep(c), stride=(4, 4),
                                explicit_padding=(3, 3))
        return jnp.sum(y).astype(jnp.float32)
    t = timed(direct, jnp.float32(0))
    print(f"direct 7x7/4 conv   {t*1e3:7.3f} ms", flush=True)

    from medsam2_tpu.core.hiera import _patch_embed_wfold
    t = timed(lambda c: jnp.sum(
        _patch_embed_wfold(p, dep(c))).astype(jnp.float32), jnp.float32(0))
    print(f"wfold 8x2 conv      {t*1e3:7.3f} ms", flush=True)

    w8 = jnp.pad(p["w"], ((1, 0), (1, 0), (0, 0), (0, 0)))
    def conv8(c):
        y = jax.lax.conv_general_dilated(
            dep(c), w8.astype(frame.dtype), (4, 4), [(4, 3), (4, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=layers.PRECISION)
        return jnp.sum(y + p["b"].astype(y.dtype)).astype(jnp.float32)
    t = timed(conv8, jnp.float32(0))
    print(f"8x8/4 padded conv   {t*1e3:7.3f} ms", flush=True)

    # parity check of the three lowerings
    a = _patch_embed_s2d(p, frame, tcfg)
    b = layers.conv2d_apply(p, frame, stride=(4, 4), explicit_padding=(3, 3))
    cc = jax.lax.conv_general_dilated(
        frame, w8.astype(frame.dtype), (4, 4), [(4, 3), (4, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=layers.PRECISION) + p["b"].astype(frame.dtype)
    for name, x in (("direct", b), ("conv8", cc)):
        err = float(jnp.max(jnp.abs(x.astype(jnp.float32) - a.astype(jnp.float32))))
        print(f"max|{name} - s2d| = {err:.5f}", flush=True)


if __name__ == "__main__":
    main()

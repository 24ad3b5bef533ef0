"""Per-frame encoder cost at batch 1/2/4 — does batching frames inside the
scan body pay on this chip?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import timed, N1, N2  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import get_config
from medsam2_tpu.core import sam2_model
from medsam2_tpu.api.video_predictor import _encode_frame
from medsam2_tpu.core.hiera import _get_pos_embed


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    trunk_pe = _get_pos_embed(params["image_encoder"]["trunk"], S // 4, S // 4)
    rng = np.random.default_rng(0)

    for B in (1, 2, 4):
        frames = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)

        def enc(c, frames=frames):
            f, _ = _encode_frame(params, frames + c * 0, cfg=cfg,
                                 trunk_pos_embed=trunk_pe)
            return jnp.sum(f[-1]).astype(jnp.float32)
        t = timed(enc, jnp.float32(0))
        print(f"B={B}: {t*1e3:7.3f} ms total, {t/B*1e3:7.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()

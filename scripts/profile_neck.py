"""FPN neck + backbone-feature prep timing @1024 (the encoder minus trunk)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import timed  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import get_config
from medsam2_tpu.core import sam2_model, image_encoder, hiera
from medsam2_tpu.api.video_predictor import _encode_frame


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    enc = params["image_encoder"]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    trunk_pe = hiera._get_pos_embed(enc["trunk"], S // 4, S // 4)

    frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), dt)
    feats = hiera.hiera_apply(enc["trunk"], cfg.trunk, frame, pos_embed=trunk_pe)
    feats = jax.block_until_ready(feats)

    def trunk_only(c):
        f = hiera.hiera_apply(enc["trunk"], cfg.trunk,
                              frame + c.astype(dt) * 0, pos_embed=trunk_pe)
        return jnp.sum(f[-1]).astype(jnp.float32)
    t = timed(trunk_only, jnp.float32(0))
    print(f"trunk only          : {t*1e3:7.3f} ms", flush=True)

    def neck_only(c):
        f = [x + c.astype(x.dtype) * 0 for x in feats]
        features, pos = image_encoder.fpn_neck_apply(enc["neck"], cfg.neck, f)
        return jnp.sum(features[-1 - cfg.scalp]).astype(jnp.float32)
    t = timed(neck_only, jnp.float32(0))
    print(f"neck only           : {t*1e3:7.3f} ms", flush=True)

    def full(c):
        f, _ = _encode_frame(params, frame + c.astype(dt) * 0, cfg=cfg,
                             trunk_pos_embed=trunk_pe)
        return jnp.sum(f[-1]).astype(jnp.float32)
    t = timed(full, jnp.float32(0))
    print(f"full encoder+prep   : {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

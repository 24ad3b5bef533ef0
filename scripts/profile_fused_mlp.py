"""A/B the fused LN->MLP->residual Pallas kernel (MEDSAM2_FUSED_MLP) on the
full production encoder (+neck), slope-timed on the real chip — the round-4
lesson says isolated kernel wins can invert in-graph (layout wars), so only
this in-context number decides the default.

Usage: python -u scripts/profile_fused_mlp.py [image_size]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from medsam2_tpu.configs import get_config
from medsam2_tpu.core import sam2_model
from medsam2_tpu.core.hiera import _get_pos_embed

N_SHORT, N_LONG = 8, 40

def timed(fn, carry0):
    ts = {}
    for n in (N_SHORT, N_LONG):
        @jax.jit
        def run(c, n=n):
            def body(c, _):
                return fn(c), 0
            c, _ = jax.lax.scan(body, c, None, length=n)
            return c
        jax.block_until_ready(run(carry0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(carry0))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT)

def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), jnp.float32)
    pe = _get_pos_embed(params["image_encoder"]["trunk"], S // 4, S // 4)
    from medsam2_tpu.api.video_predictor import _encode_frame

    for fused in ("0", "1", "0", "1"):  # repeated A/B
        os.environ["MEDSAM2_FUSED_MLP"] = fused
        def full(c):
            f, _ = _encode_frame(params, frame + c * 0, cfg=cfg,
                                 trunk_pos_embed=pe)
            return jnp.sum(f[-1]).astype(jnp.float32)
        t = timed(full, jnp.float32(0))
        print(f"fused_mlp={fused}: encoder+neck {t*1e3:7.3f} ms", flush=True)

if __name__ == "__main__":
    main()

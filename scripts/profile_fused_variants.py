"""A/B the encoder fusion variants on the full production encoder (+neck),
slope-timed on the real chip:

  base        — library defaults (no pallas fusion)
  mlp_all     — MEDSAM2_FUSED_MLP=1 (every block tail; measured negative r5)
  mlp_c192    — fused MLP capped at C<=192 (bandwidth-bound stages 1-2 only)
  block       — MEDSAM2_FUSED_BLOCK=1 (fully-fused plain windowed blocks 0+2)
  block+mlp   — fused block + capped fused MLP for the remaining small tails

Usage: python -u scripts/profile_fused_variants.py [image_size]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from medsam2_tpu.configs import get_config
from medsam2_tpu.core import sam2_model
from medsam2_tpu.core.hiera import _get_pos_embed

N_SHORT, N_LONG = 8, 40

VARIANTS = [
    ("base",      {"MEDSAM2_FUSED_MLP": "0", "MEDSAM2_FUSED_BLOCK": "0"}),
    ("mlp_c192",  {"MEDSAM2_FUSED_MLP": "1", "MEDSAM2_FUSED_MLP_MAXC": "192",
                   "MEDSAM2_FUSED_BLOCK": "0"}),
    ("block",     {"MEDSAM2_FUSED_MLP": "0", "MEDSAM2_FUSED_BLOCK": "1"}),
    ("block+mlp", {"MEDSAM2_FUSED_MLP": "1", "MEDSAM2_FUSED_MLP_MAXC": "192",
                   "MEDSAM2_FUSED_BLOCK": "1"}),
]


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

    # on-chip parity gate: every variant's feature maps must match base
    # (bf16 path -> loose-ish tol; interpret-mode tests can't catch compiled
    # Mosaic bugs, this does)
    outs = {}
    for name, env in VARIANTS:
        os.environ.update(env)
        feats, _ = jax.jit(lambda fr: _encode_frame(
            params, fr, cfg=cfg, trunk_pos_embed=pe))(frame)
        outs[name] = [np.asarray(f, np.float32) for f in feats]
    for name in list(outs)[1:]:
        for a, b in zip(outs["base"], outs[name]):
            err = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-6)
            assert err < 5e-2, f"{name} diverges from base: rel {err}"
        print(f"parity ok: {name} == base", flush=True)

    for _rep in range(2):
        for name, env in VARIANTS:
            os.environ.update(env)
            def full(c):
                f, _ = _encode_frame(params, frame + c * 0, cfg=cfg,
                                     trunk_pos_embed=pe)
                return jnp.sum(f[-1]).astype(jnp.float32)
            t = timed(full, jnp.float32(0))
            print(f"{name:10s}: encoder+neck {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

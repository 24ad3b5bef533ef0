"""Per-component propagation profiling on the real TPU.

Times each stage of the per-frame tracking pipeline (encoder, memory
attention, SAM heads, memory encoder) as an N-iteration ``lax.scan`` with a
carried dependency, so the tunnel RTT amortizes and XLA cannot dead-code the
loop. Prints ms/iter per component plus the analytic FLOPs and implied MFU.

Usage: python -u scripts/profile_components.py [image_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import get_config
from medsam2_tpu.core import sam2_model
from medsam2_tpu.state import memory_bank as mb
from medsam2_tpu.api.video_predictor import _encode_frame, _expand_to_objects

N_SHORT, N_LONG = 8, 40


def timed_scan(fn, init_carry):
    """fn: carry -> carry (scalar). Times jit(scan(fn)) at two trip counts and
    returns the per-iter slope — the python-visible call floor (tunnel RTT +
    dispatch, ~27 ms here) cancels exactly."""
    ts = {}
    for n in (N_SHORT, N_LONG):
        @jax.jit
        def run(c, n=n):
            def body(c, _):
                return fn(c), 0
            c, _ = jax.lax.scan(body, c, None, length=n)
            return c

        out = run(init_carry)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(init_carry)))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT)


def main():
    image_size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = get_config("sam2_hiera_t", image_size=image_size)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    spec = mb.BankSpec.from_config(cfg, max_cond_frames=1)
    S = cfg.image_size
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), jnp.float32)

    from medsam2_tpu.core.hiera import _get_pos_embed
    trunk_pe = _get_pos_embed(params["image_encoder"]["trunk"], S // 4, S // 4)

    # --- reference features for the downstream components ---
    feats, pos = _encode_frame(params, frame, cfg=cfg, trunk_pos_embed=trunk_pe)
    feats, pos = _expand_to_objects(feats, pos, 1)
    bank = mb.init_bank(spec, 1)
    # fill the bank so memory attention sees a steady-state kv span
    fill = jnp.asarray(rng.standard_normal(
        (1, spec.mem_spatial, spec.mem_dim)), jnp.float32)
    optr = jnp.asarray(rng.standard_normal((1, spec.hidden_dim)), jnp.float32)
    bank = mb.write_bank(spec, bank, 0, fill, optr, is_cond=True)
    for t in range(1, 12):
        bank = mb.write_bank(spec, bank, t, fill, optr, is_cond=False)

    results = {}

    # 1. encoder
    def enc_fn(c):
        f, _ = _encode_frame(params, frame + c * 0, cfg=cfg,
                             trunk_pos_embed=trunk_pe)
        return jnp.sum(f[-1]).astype(jnp.float32)
    results["encoder"] = timed_scan(enc_fn, jnp.float32(0))

    # 2. memory attention (readout + 4 layers)
    def mem_fn(c):
        out = sam2_model.prepare_memory_conditioned_features(
            params, cfg, spec, bank, jnp.int32(12) + c.astype(jnp.int32) * 0,
            False, feats[-1] + c.astype(feats[-1].dtype) * 0, pos[-1], num_frames=64, is_eval=True)
        return jnp.sum(out).astype(jnp.float32)
    results["memory_attention"] = timed_scan(mem_fn, jnp.float32(0))

    # 3. SAM heads
    high_res = list(feats[:-1]) if len(feats) > 1 else None
    def heads_fn(c):
        out = sam2_model.forward_sam_heads(
            params, cfg, feats[-1] + c.astype(feats[-1].dtype) * 0, high_res_features=high_res,
            multimask_output=False, eval_dynamic_multimask=True)
        return jnp.sum(out.low_res_masks).astype(jnp.float32)
    results["sam_heads"] = timed_scan(heads_fn, jnp.float32(0))

    # 4. memory encoder
    hi_mask = jnp.asarray(rng.standard_normal((1, 1, S, S)), jnp.float32)
    def menc_fn(c):
        f, _ = sam2_model.encode_new_memory(
            params, cfg, feats[-1], hi_mask + c.astype(hi_mask.dtype) * 0, is_mask_from_pts=True,
            binarize=True)
        return jnp.sum(f).astype(jnp.float32)
    results["memory_encoder"] = timed_scan(menc_fn, jnp.float32(0))

    # 5. full track_step
    def step_fn(c):
        out, _ = sam2_model.track_step(
            params, cfg, spec, bank, jnp.int32(12) + c.astype(jnp.int32) * 0,
            is_init_cond_frame=False,
            current_vision_feats=[f + c.astype(f.dtype) * 0 for f in feats],
            current_vision_pos=pos,
            multimask_output=False, run_mem_encoder=True,
            num_frames=64, is_eval=True)
        return jnp.sum(out["pred_masks"]).astype(jnp.float32)
    results["track_step_total"] = timed_scan(step_fn, jnp.float32(0))

    from medsam2_tpu.utils.flops import peak_flops, propagation_flops
    flops = propagation_flops(cfg, spec, num_objects=1)
    peak = peak_flops() or float("nan")
    print(f"\n{'component':20s} {'ms':>8s} {'GFLOP':>8s} {'MFU %':>7s}")
    for k, sec in results.items():
        gf = flops.get(k, flops.get("total") if k == "track_step_total" else None)
        if gf is not None:
            print(f"{k:20s} {sec * 1e3:8.2f} {gf / 1e9:8.1f} "
                  f"{gf / sec / peak * 100:7.2f}")
        else:
            print(f"{k:20s} {sec * 1e3:8.2f}")
    total_ms = results["track_step_total"] * 1e3
    enc_ms = results["encoder"] * 1e3
    print(f"\nencoder+track = {enc_ms + total_ms:.2f} ms/frame "
          f"-> {1e3 / (enc_ms + total_ms):.1f} fps")


if __name__ == "__main__":
    main()

"""Bisect the pathologically slow toy-model CPU-mesh train-step compile.

VERDICT r4: the embed-dim-8, 4-block, 64-px, 4-frame train step takes
~2m40s to compile on the virtual 8-CPU mesh — suspects: chained-window
graph at window=2, remat, scan interaction, flash paths. This script times
trace (jaxpr), lower (StableHLO) and compile (XLA) separately for one flag
config; run it per-config in subprocesses (env is read at import/trace time).

Usage: python scripts/bisect_dryrun_compile.py [label]
Env knobs: MEDSAM2_CHAIN_WINDOWS, MEDSAM2_SPLIT_QKV, BISECT_REMAT=0,
BISECT_SHARDED=0 (single device instead of mesh), BISECT_STAGE=trace|lower|all
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config, HieraConfig, FpnNeckConfig
from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.parallel import mesh as pmesh
from medsam2_tpu.train import recipe_3d


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    cfg = SAM2Config(
        trunk=HieraConfig(embed_dim=8, stages=(1, 1, 1, 1), window_spec=(2, 2, 2, 2),
                          global_att_blocks=(2,),
                          window_pos_embed_bkg_spatial_size=(3, 3)),
        neck=FpnNeckConfig(backbone_channel_list=(64, 32, 16, 8)),
        image_size=64,
        compute_dtype="float32",
    )
    rcfg = recipe_3d.Recipe3DConfig(
        video_length=int(os.environ.get("BISECT_T", "4")),
        prompt_freq=2,
        num_objects=int(os.environ.get("BISECT_O", "2")),
        max_cond_frames=2,
        remat=os.environ.get("BISECT_REMAT", "enc_saved"))
    sharded = os.environ.get("BISECT_SHARDED", "1") == "1"
    n = 8
    model_axis = 2
    params = sam2_init(jax.random.PRNGKey(0), cfg)
    tx, _ = recipe_3d.make_optimizers(params, cfg, rcfg)
    step = recipe_3d.make_train_step(cfg, rcfg, tx)

    Bv = n // model_axis if sharded else 4
    T, O, S, P = rcfg.video_length, rcfg.num_objects, cfg.image_size, cfg.max_prompt_points
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.random((Bv, T, S, S, 3)).astype(np.float32)),
        "gt_masks": jnp.asarray((rng.random((Bv, T, O, S, S)) > 0.7).astype(np.float32)),
        "prompt_coords": jnp.asarray(rng.random((Bv, 2, O, P, 2)).astype(np.float32) * S),
        "prompt_labels": jnp.asarray(
            np.broadcast_to(np.array([2, 3] + [-1] * (P - 2), np.int32), (Bv, 2, O, P)).copy()),
        "prompt_use_mask": jnp.zeros((Bv, 2, O), bool),
        "obj_valid": jnp.ones((Bv, O), bool),
    }

    ctx = None
    if sharded:
        mesh = pmesh.make_mesh(n, model_axis=model_axis)
        ctx = mesh.__enter__()
        params = pmesh.shard_params(params, mesh)
        batch = pmesh.shard_batch(batch, mesh)
    opt_state = tx.init(params)

    jf = jax.jit(step)
    t0 = time.time()
    traced = jf.trace(params, opt_state, batch)
    t1 = time.time()
    stage = os.environ.get("BISECT_STAGE", "all")
    print(f"[{label}] trace: {t1-t0:.1f}s  jaxpr_eqns={len(traced.jaxpr.eqns)}",
          flush=True)
    if stage == "trace":
        return
    lowered = traced.lower()
    t2 = time.time()
    hlo_lines = lowered.as_text().count("\n")
    print(f"[{label}] lower: {t2-t1:.1f}s  stablehlo_lines={hlo_lines}", flush=True)
    if stage == "lower":
        return
    compiled = lowered.compile()
    t3 = time.time()
    print(f"[{label}] compile: {t3-t2:.1f}s  TOTAL {t3-t0:.1f}s", flush=True)
    if ctx is not None:
        mesh.__exit__(None, None, None)


if __name__ == "__main__":
    main()

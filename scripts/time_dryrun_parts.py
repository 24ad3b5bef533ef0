"""Time each candidate piece of the restructured dryrun on the 8-CPU mesh.

Parts (select with DRYRUN_PART=train_eager|stream_jit|stream_eager|train_jit1):
- train_eager: the single-device toy train step under jax.disable_jit()
- train_jit1: the sharded toy train step with ONE prompt frame (video 3/freq 3)
- stream_jit: the sharded 16f hiera_t@128 streaming compile
- stream_eager: the single-device streaming run under disable_jit
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
if os.environ.get("DRYRUN_CACHE"):
    jax.config.update("jax_compilation_cache_dir", os.environ["DRYRUN_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config, HieraConfig, FpnNeckConfig, sam2_hiera_t
from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.parallel import mesh as pmesh
from medsam2_tpu.train import recipe_3d


def toy_cfg():
    return SAM2Config(
        trunk=HieraConfig(embed_dim=8, stages=(1, 1, 1, 1), window_spec=(2, 2, 2, 2),
                          global_att_blocks=(2,),
                          window_pos_embed_bkg_spatial_size=(3, 3)),
        neck=FpnNeckConfig(backbone_channel_list=(64, 32, 16, 8)),
        image_size=64,
        compute_dtype="float32",
    )


def toy_batch(rcfg, cfg, Bv):
    T, O, S, P = rcfg.video_length, rcfg.num_objects, cfg.image_size, cfg.max_prompt_points
    n_prompt = len(rcfg.prompt_frames)
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.random((Bv, T, S, S, 3)).astype(np.float32)),
        "gt_masks": jnp.asarray((rng.random((Bv, T, O, S, S)) > 0.7).astype(np.float32)),
        "prompt_coords": jnp.asarray(rng.random((Bv, n_prompt, O, P, 2)).astype(np.float32) * S),
        "prompt_labels": jnp.asarray(
            np.broadcast_to(np.array([2, 3] + [-1] * (P - 2), np.int32),
                            (Bv, n_prompt, O, P)).copy()),
        "prompt_use_mask": jnp.zeros((Bv, n_prompt, O), bool),
        "obj_valid": jnp.ones((Bv, O), bool),
    }


def main():
    part = os.environ.get("DRYRUN_PART", "train_eager")
    t_start = time.time()
    if part in ("train_eager", "train_jit1"):
        cfg = toy_cfg()
        vl, pf = (3, 3) if part == "train_jit1" else (4, 2)
        rcfg = recipe_3d.Recipe3DConfig(video_length=vl, prompt_freq=pf,
                                        num_objects=2, max_cond_frames=2)
        params = sam2_init(jax.random.PRNGKey(0), cfg)
        tx, _ = recipe_3d.make_optimizers(params, cfg, rcfg)
        step = recipe_3d.make_train_step(cfg, rcfg, tx)
        batch = toy_batch(rcfg, cfg, 4)
        opt_state = tx.init(params)
        t0 = time.time()
        if part == "train_eager":
            with jax.disable_jit():
                _, _, metrics = step(params, opt_state, batch)
                loss = float(metrics["loss"])
        else:
            mesh = pmesh.make_mesh(8, model_axis=2)
            with mesh:
                sp = pmesh.shard_params(params, mesh)
                so = tx.init(sp)
                sb = pmesh.shard_batch(batch, mesh)
                _, _, metrics = jax.jit(step)(sp, so, sb)
                loss = float(metrics["loss"])
        print(f"[{part}] run: {time.time()-t0:.1f}s loss={loss:.4f}", flush=True)
    else:
        from medsam2_tpu.state import memory_bank as mb
        from medsam2_tpu.api.video_predictor import propagate_volumes_batched
        img, num_vol, num_frames = 128, 8, int(os.environ.get("DRYRUN_FRAMES", 16))
        scfg = sam2_hiera_t(image_size=img, compute_dtype="float32")
        sparams = sam2_init(jax.random.PRNGKey(1), scfg)
        spec = mb.BankSpec.from_config(scfg, max_cond_frames=1)
        rng = np.random.default_rng(0)
        videos = jnp.asarray(rng.random((num_vol, num_frames, img, img, 3)).astype(np.float32))
        coords = jnp.full((num_vol, 1, 1, 2), img / 2, jnp.float32)
        p_labels = jnp.ones((num_vol, 1, 1), jnp.int32)
        t0 = time.time()
        if part == "stream_jit":
            mesh = pmesh.make_mesh(8, model_axis=2)
            stream = jax.jit(lambda p, v, c, l: propagate_volumes_batched(
                p, scfg, spec, v, c, l, num_objects=1))
            with mesh:
                sp = pmesh.shard_params(sparams, mesh)
                sv = pmesh.shard_batch({"v": videos, "c": coords, "l": p_labels}, mesh)
                m = stream(sp, sv["v"], sv["c"], sv["l"])
                tot = float(jnp.sum(jnp.isfinite(m)))
        else:
            with jax.disable_jit():
                m = propagate_volumes_batched(sparams, scfg, spec, videos,
                                              coords, p_labels, num_objects=1)
                tot = float(jnp.sum(jnp.isfinite(m)))
        print(f"[{part}] run: {time.time()-t0:.1f}s finite={tot==m.size}", flush=True)
    print(f"[{part}] TOTAL wall {time.time()-t_start:.1f}s", flush=True)


if __name__ == "__main__":
    main()

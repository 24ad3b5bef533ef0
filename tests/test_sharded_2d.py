"""Sharded 2D training: the REFUGE recipe step runs with dp x tp on the
virtual 8-device mesh (3D coverage lives in test_train_3d)."""

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.parallel import mesh as pmesh
from medsam2_tpu.state import similarity_bank as sb
from medsam2_tpu.train import recipe_2d
from tests.test_predictors import TINY


def test_sharded_2d_train_step(rng):
    mesh = pmesh.make_mesh(8, model_axis=2)
    params = sam2_init(jax.random.PRNGKey(0), TINY)
    rcfg = recipe_2d.Recipe2DConfig(memory_bank_size=4, out_size=64)
    tx = recipe_2d.make_optimizer_2d(rcfg)
    step = jax.jit(recipe_2d.make_train_step_2d(TINY, rcfg, tx),
                   static_argnames=("bank_nonempty",))

    B = 4
    gt = np.zeros((B, 64, 64), np.float32)
    gt[:, 20:44, 20:44] = 1.0
    batch = {
        "images": jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32)),
        "coords": jnp.full((B, 1, 2), 32.0, jnp.float32),
        "labels": jnp.ones((B, 1), jnp.int32),
        "gt_masks": jnp.asarray(gt),
    }
    P = (TINY.image_size // 16) ** 2
    with mesh:
        sp = pmesh.shard_params(params, mesh)
        opt_state = tx.init(sp)
        sbatch = pmesh.shard_batch(batch, mesh)
        bank = pmesh.replicated(
            sb.init_similarity_bank(4, P, TINY.mem_dim, P * 256), mesh)
        new_params, opt_state, bank, metrics = step(
            sp, opt_state, sbatch, bank, jax.random.PRNGKey(1),
            bank_nonempty=False)
        # second step reads the bank
        new_params, opt_state, bank, metrics = step(
            new_params, opt_state, sbatch, bank, jax.random.PRNGKey(2),
            bank_nonempty=True)
    assert np.isfinite(float(metrics["loss"]))
    assert int(np.asarray(bank["valid"]).sum()) >= 1

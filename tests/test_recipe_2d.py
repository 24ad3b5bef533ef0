"""2D recipe tests: similarity bank semantics + end-to-end click training."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from medsam2_tpu.state import similarity_bank as sb
from medsam2_tpu.train import recipe_2d
from medsam2_tpu.core.sam2_model import sam2_init
from tests.test_predictors import TINY


def test_bank_fill_then_replace(rng):
    K, P, D, E = 4, 8, 2, 16
    bank = sb.init_similarity_bank(K, P, D, E)
    feats = jnp.asarray(rng.standard_normal((3, P, D)).astype(np.float32))
    embeds = jnp.asarray(rng.standard_normal((3, E)).astype(np.float32))
    bank = sb.write_similarity_bank(bank, feats, jnp.float32(0.9), embeds)
    assert int(bank["valid"].sum()) == 3
    np.testing.assert_allclose(np.asarray(bank["feats"][0]), np.asarray(feats[0]))

    # fill to capacity
    feats2 = jnp.asarray(rng.standard_normal((1, P, D)).astype(np.float32))
    embeds2 = jnp.asarray(rng.standard_normal((1, E)).astype(np.float32))
    bank = sb.write_similarity_bank(bank, feats2, jnp.float32(0.9), embeds2)
    assert int(bank["valid"].sum()) == 4

    # identical duplicates in the bank + a very dissimilar new feature with
    # good IoU -> replacement should fire
    dup = jnp.broadcast_to(feats[0][None], (2, P, D))
    bank2 = sb.init_similarity_bank(K, P, D, E)
    bank2 = sb.write_similarity_bank(
        bank2, jnp.concatenate([feats[:2], dup]), jnp.float32(0.5),
        jnp.asarray(rng.standard_normal((4, E)).astype(np.float32)))
    new = -feats[0:1] * 3.0
    bank3 = sb.write_similarity_bank(
        bank2, new, jnp.float32(0.9),
        jnp.asarray(rng.standard_normal((1, E)).astype(np.float32)))
    stored = np.asarray(bank3["feats"])
    assert any(np.allclose(stored[k], np.asarray(new[0])) for k in range(K))

    # low IoU blocks replacement (soft-iou rule)
    bank4 = sb.write_similarity_bank(
        bank2, -feats[1:2] * 3.0, jnp.float32(0.1),
        jnp.asarray(rng.standard_normal((1, E)).astype(np.float32)))
    stored4 = np.asarray(bank4["feats"])
    assert not any(np.allclose(stored4[k], np.asarray(-feats[1] * 3.0)) for k in range(K))


def test_bank_read_prefers_similar(rng):
    K, P, D, E = 4, 8, 2, 16
    bank = sb.init_similarity_bank(K, P, D, E)
    embeds = np.eye(4, E).astype(np.float32) * 10
    feats = rng.standard_normal((4, P, D)).astype(np.float32)
    bank = sb.write_similarity_bank(bank, jnp.asarray(feats), jnp.float32(0.9),
                                    jnp.asarray(embeds))
    cur = jnp.asarray(embeds[2:3])  # matches slot 2
    mem, idx = sb.read_similarity_bank(bank, cur, jax.random.PRNGKey(0), 64)
    counts = np.bincount(np.asarray(idx[0]), minlength=4)
    assert counts[2] == counts.max()  # most-similar slot sampled most


def test_train_step_2d_end_to_end(rng):
    params = sam2_init(jax.random.PRNGKey(0), TINY)
    rcfg = recipe_2d.Recipe2DConfig(memory_bank_size=4, out_size=64, lr=1e-4)
    tx = recipe_2d.make_optimizer_2d(rcfg)
    step = jax.jit(recipe_2d.make_train_step_2d(TINY, rcfg, tx),
                   static_argnames=("bank_nonempty",))
    opt_state = tx.init(params)

    spec_P = (TINY.image_size // 16) ** 2
    bank = sb.init_similarity_bank(rcfg.memory_bank_size, spec_P, TINY.mem_dim,
                                   spec_P * 256)

    B = 2
    gt = np.zeros((B, 64, 64), np.float32)
    gt[:, 20:44, 20:44] = 1.0
    batch = {
        "images": jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32)),
        "coords": jnp.asarray(np.full((B, 1, 2), 32.0, np.float32)),
        "labels": jnp.asarray(np.ones((B, 1), np.int32)),
        "gt_masks": jnp.asarray(gt),
    }
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(4):
        key, sub = jax.random.split(key)
        params, opt_state, bank, metrics = step(
            params, opt_state, batch, bank, sub, bank_nonempty=(i > 0))
        assert np.isfinite(float(metrics["loss"]))
        losses.append(float(metrics["loss"]))
    assert int(np.asarray(bank["valid"]).sum()) >= 2  # bank populated
    assert losses[-1] < losses[0]

"""Training-dropout activation tests (VERDICT r1 #7).

The reference trains with dropout 0.1 active in the memory-attention layers
(``memory_attention.py:33-104``: three residual dropouts + the inner FFN
dropout) and in the DPA-P2PNet head MLPs (``dpa_p2pnet.py:65-75``). Here
dropout is keyed: passing a PRNG key makes the forward stochastic; omitting it
is deterministic (inference)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import MemoryAttentionConfig
from medsam2_tpu.core.memory import memory_attention_apply, memory_attention_init
from tests.test_predictors import TINY


MA = MemoryAttentionConfig(d_model=16, num_layers=2, dim_feedforward=32,
                           kv_in_dim=8, rope_feat_sizes=(4, 4))


def _ma_inputs(rng):
    curr = jnp.asarray(rng.standard_normal((2, 16, 16)).astype(np.float32))
    mem = jnp.asarray(rng.standard_normal((2, 20, 8)).astype(np.float32))
    cpos = jnp.asarray(rng.standard_normal((2, 16, 16)).astype(np.float32))
    mpos = jnp.asarray(rng.standard_normal((2, 20, 8)).astype(np.float32))
    return curr, mem, cpos, mpos


def test_memory_attention_dropout_keyed(rng):
    p = memory_attention_init(jax.random.PRNGKey(0), MA)
    curr, mem, cpos, mpos = _ma_inputs(rng)
    args = (p, MA, curr, mem, cpos, mpos)
    kw = dict(q_hw=(4, 4), num_obj_ptr_tokens=4)

    # no key -> deterministic
    a = memory_attention_apply(*args, **kw)
    b = memory_attention_apply(*args, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # same key -> reproducible; different keys -> different
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    d1 = memory_attention_apply(*args, **kw, dropout_key=k1)
    d1b = memory_attention_apply(*args, **kw, dropout_key=k1)
    d2 = memory_attention_apply(*args, **kw, dropout_key=k2)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))
    assert not np.allclose(np.asarray(d1), np.asarray(a))
    assert not np.allclose(np.asarray(d1), np.asarray(d2))


def test_memory_attention_dropout_rate_zero_noop(rng):
    ma0 = MemoryAttentionConfig(d_model=16, num_layers=2, dim_feedforward=32,
                                kv_in_dim=8, rope_feat_sizes=(4, 4), dropout=0.0)
    p = memory_attention_init(jax.random.PRNGKey(0), ma0)
    curr, mem, cpos, mpos = _ma_inputs(rng)
    a = memory_attention_apply(p, ma0, curr, mem, cpos, mpos, q_hw=(4, 4),
                               num_obj_ptr_tokens=4)
    d = memory_attention_apply(p, ma0, curr, mem, cpos, mpos, q_hw=(4, 4),
                               num_obj_ptr_tokens=4,
                               dropout_key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(a), np.asarray(d), atol=1e-6)


def test_prompter_dropout_keyed(rng):
    from medsam2_tpu.prompter.dpa_p2pnet import (
        PrompterConfig, prompter_apply, prompter_init)

    cfg = PrompterConfig(backbone="resnet18", hidden_dim=32, space=16,
                         use_sr_pfo=False)
    params = prompter_init(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))

    a, _ = prompter_apply(params, cfg, images)
    b, _ = prompter_apply(params, cfg, images)
    np.testing.assert_array_equal(np.asarray(a["pred_coords"]),
                                  np.asarray(b["pred_coords"]))

    d1, _ = prompter_apply(params, cfg, images,
                           dropout_key=jax.random.PRNGKey(1))
    d1b, _ = prompter_apply(params, cfg, images,
                            dropout_key=jax.random.PRNGKey(1))
    d2, _ = prompter_apply(params, cfg, images,
                           dropout_key=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(d1["pred_logits"]),
                                  np.asarray(d1b["pred_logits"]))
    assert not np.allclose(np.asarray(d1["pred_logits"]),
                           np.asarray(a["pred_logits"]))
    assert not np.allclose(np.asarray(d1["pred_logits"]),
                           np.asarray(d2["pred_logits"]))


def test_train_step_3d_dropout_key(rng):
    """3D train step: stochastic with a key, deterministic without."""
    import optax
    from medsam2_tpu.core.sam2_model import sam2_init
    from medsam2_tpu.train import recipe_3d

    rcfg = recipe_3d.Recipe3DConfig(video_length=4, prompt_freq=2,
                                    num_objects=1, max_cond_frames=2)
    params = sam2_init(jax.random.PRNGKey(0), TINY)
    tx, _ = recipe_3d.make_optimizers(params, TINY, rcfg)
    opt_state = tx.init(params)
    step = jax.jit(recipe_3d.make_train_step(TINY, rcfg, tx))

    S = TINY.image_size
    batch = {
        "images": jnp.asarray(rng.standard_normal((1, 4, S, S, 3)), jnp.float32),
        "gt_masks": jnp.asarray(rng.random((1, 4, 1, S, S)) > 0.7, jnp.float32),
        "prompt_coords": jnp.full((1, 2, 1, 2, 2), S / 2, jnp.float32),
        "prompt_labels": jnp.broadcast_to(jnp.asarray([2, 3], jnp.int32),
                                          (1, 2, 1, 2)),
        "prompt_use_mask": jnp.zeros((1, 2, 1), bool),
        "obj_valid": jnp.ones((1, 1), bool),
    }

    _, _, m_plain1 = step(params, opt_state, batch)
    _, _, m_plain2 = step(params, opt_state, batch)
    assert float(m_plain1["loss"]) == float(m_plain2["loss"])

    _, _, m_k1 = step(params, opt_state, batch, jax.random.PRNGKey(7))
    _, _, m_k1b = step(params, opt_state, batch, jax.random.PRNGKey(7))
    _, _, m_k2 = step(params, opt_state, batch, jax.random.PRNGKey(8))
    assert float(m_k1["loss"]) == float(m_k1b["loss"])
    assert float(m_k1["non_prompt_loss"]) != float(m_plain1["non_prompt_loss"])
    assert float(m_k1["non_prompt_loss"]) != float(m_k2["non_prompt_loss"])
    assert np.isfinite(float(m_k1["loss"]))

"""3D training recipe tests: loss decreases on a synthetic volume, two-group
optimizer updates the right params, and the sharded step runs on an 8-device
CPU mesh (dp x tp)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config, HieraConfig, FpnNeckConfig
from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.state import memory_bank as mb
from medsam2_tpu.train import recipe_3d
from medsam2_tpu.parallel import mesh as pmesh


TINY = SAM2Config(
    trunk=HieraConfig(embed_dim=8, stages=(1, 1, 1, 1), window_spec=(2, 2, 2, 2),
                      global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(3, 3)),
    neck=FpnNeckConfig(backbone_channel_list=(64, 32, 16, 8)),
    image_size=64,
    compute_dtype="float32",
)

# reference lrs (train_3d.py:50-54); higher rates flip the object-score head
# into the hard NO_OBJ_SCORE regime on random-init tiny models
RCFG = recipe_3d.Recipe3DConfig(video_length=4, prompt_freq=2, num_objects=2,
                                lr_sam=1e-4, lr_mem=1e-8, max_cond_frames=2)


def synth_batch(Bv=1, T=4, O=2, S=64, P=8, n_prompt=2):
    rng = np.random.default_rng(0)
    images = rng.random((Bv, T, S, S, 3)).astype(np.float32)
    gt = np.zeros((Bv, T, O, S, S), np.float32)
    gt[:, :, 0, 16:40, 16:40] = 1.0
    gt[:, :, 1, 44:60, 8:24] = 1.0
    coords = np.zeros((Bv, n_prompt, O, P, 2), np.float32)
    labels = -np.ones((Bv, n_prompt, O, P), np.int32)
    for o, (x0, y0, x1, y1) in enumerate([(16, 16, 40, 40), (8, 44, 24, 60)]):
        coords[:, :, o, 0] = [x0, y0]
        coords[:, :, o, 1] = [x1, y1]
        labels[:, :, o, 0] = 2
        labels[:, :, o, 1] = 3
    return {
        "images": jnp.asarray(images),
        "gt_masks": jnp.asarray(gt),
        "prompt_coords": jnp.asarray(coords),
        "prompt_labels": jnp.asarray(labels),
        "prompt_use_mask": jnp.zeros((Bv, n_prompt, O), bool),
        "obj_valid": jnp.ones((Bv, O), bool),
    }


@pytest.fixture(scope="module")
def setup():
    params = sam2_init(jax.random.PRNGKey(0), TINY)
    tx, labels = recipe_3d.make_optimizers(params, TINY, RCFG)
    step = jax.jit(recipe_3d.make_train_step(TINY, RCFG, tx))
    return params, tx, step


def test_loss_finite_and_decreasing(setup):
    params, tx, step = setup
    opt_state = tx.init(params)
    batch = synth_batch()
    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_param_group_updates(setup):
    params, tx, step = setup
    opt_state = tx.init(params)
    batch = synth_batch()
    new_params, _, _ = step(params, opt_state, batch)

    def changed(a, b):
        return any(
            not np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    # decoder + memory path update; image encoder and prompt encoder frozen
    assert changed(params["sam_mask_decoder"], new_params["sam_mask_decoder"])
    assert changed(params["memory_attention"], new_params["memory_attention"])
    assert not changed(params["image_encoder"], new_params["image_encoder"])
    assert not changed(params["sam_prompt_encoder"], new_params["sam_prompt_encoder"])


def test_sharded_train_step_8dev():
    """dp x tp on the virtual 8-device CPU mesh: the sharded step must produce
    the SAME loss and parameter updates as the plain single-device step on the
    same batch (collective reduction order differs, so fp32 round-off, not
    bit-exact) — finiteness alone is not multi-chip correctness."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 host devices"
    mesh = pmesh.make_mesh(8, model_axis=2)
    params = sam2_init(jax.random.PRNGKey(0), TINY)
    tx, _ = recipe_3d.make_optimizers(params, TINY, RCFG)
    step = jax.jit(recipe_3d.make_train_step(TINY, RCFG, tx))

    host_batch = synth_batch(Bv=4)
    with mesh:
        sharded_params = pmesh.shard_params(params, mesh)
        opt_state = tx.init(sharded_params)
        batch = pmesh.shard_batch(host_batch, mesh)
        new_params, opt_state, metrics = step(sharded_params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # TP shardings survive the step
    lin1 = new_params["memory_attention"]["layers"][0]["linear1"]["w"]
    assert "model" in str(lin1.sharding.spec)

    # numerical equivalence vs the unsharded step
    s_new, _, s_metrics = step(params, tx.init(params), host_batch)
    np.testing.assert_allclose(float(metrics["loss"]), float(s_metrics["loss"]),
                               rtol=1e-5)
    flat_new, _ = jax.tree_util.tree_flatten_with_path(new_params)
    flat_old = jax.tree_util.tree_leaves(params)
    flat_single = jax.tree_util.tree_leaves(s_new)
    moved = 0.0
    for (path, a), b, c in zip(flat_new, flat_old, flat_single):
        d_sharded = np.asarray(a) - np.asarray(b)
        d_single = np.asarray(c) - np.asarray(b)
        # near-zero-gradient elements sit at Adam's eps knee, where a
        # different collective / codegen reduction order (it changes per HOST
        # on XLA:CPU) yields O(1e-6) absolute noise on O(1e-8) updates — the
        # noise exceeds the update itself, so a tight per-element atol is
        # host-brittle (CLAUDE.md hazard; observed 2.1e-6 on k_proj.b). The
        # 1e-5 floor is harmless in parameter space (params are O(1e-1));
        # the strict 5e-3/1e-6 equivalence stays pinned by the dryrun golden.
        scale = float(np.abs(d_single).max())
        np.testing.assert_allclose(
            d_sharded, d_single, rtol=5e-3, atol=max(1e-5, 1e-2 * scale),
            err_msg=f"sharded update diverges at {jax.tree_util.keystr(path)}")
        moved = max(moved, scale)
    assert moved > 1e-6, "no parameter moved — equivalence check is vacuous"


def test_fused_cotangent_pull_matches_two_pulls():
    """The vmapped double-cotangent pull produces the same update as the
    classic two-vjp-pull formulation (both reproduce the reference's
    retain_graph grad flow)."""
    import dataclasses

    params = sam2_init(jax.random.PRNGKey(0), TINY)
    batch = synth_batch(Bv=1)
    outs = {}
    for fused in (True, False):
        rcfg = dataclasses.replace(RCFG, fused_cotangent_pull=fused)
        tx, _ = recipe_3d.make_optimizers(params, TINY, rcfg)
        step = jax.jit(recipe_3d.make_train_step(TINY, rcfg, tx))
        p, _, metrics = step(params, tx.init(params), batch)
        outs[fused] = (p, metrics)
    np.testing.assert_allclose(float(outs[True][1]["loss"]),
                               float(outs[False][1]["loss"]), rtol=1e-6)
    a = outs[True][0]["sam_mask_decoder"]
    b = outs[False][0]["sam_mask_decoder"]
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                                atol=5e-6, rtol=5e-4), a, b)
    a = outs[True][0]["memory_attention"]
    b = outs[False][0]["memory_attention"]
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                                atol=5e-6, rtol=5e-4), a, b)


def test_train_kcache_matches_no_cache():
    """The training roped-key cache is a pure lowering: losses and gradients
    match the per-frame projection path (k-proj/RoPE are applied per memory
    token either way; fp32 keeps the comparison tight)."""
    import dataclasses

    params = sam2_init(jax.random.PRNGKey(0), TINY)
    batch = synth_batch(Bv=1)
    spec = mb.BankSpec.from_config(TINY, max_cond_frames=RCFG.max_cond_frames)

    grads, losses = {}, {}
    for cached in (True, False):
        rcfg = dataclasses.replace(RCFG, use_kcache=cached)

        def total_loss(p, rcfg=rcfg):
            vol = {k: v[0] for k, v in batch.items()}
            pl, npl = recipe_3d.volume_losses(p, TINY, spec, rcfg, vol)
            return pl + npl

        losses[cached], grads[cached] = jax.jit(
            jax.value_and_grad(total_loss))(params)

    np.testing.assert_allclose(float(losses[True]), float(losses[False]),
                               rtol=1e-5)
    for group in ("sam_mask_decoder", "memory_attention", "memory_encoder",
                  "obj_ptr_proj"):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=1e-5, rtol=2e-3),
            grads[True][group], grads[False][group])

"""Prompter stack tests: grid sampling vs torch, anchors, matcher vs scipy
direct, criterion behavior, and the joint nuclei train step end-to-end."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from medsam2_tpu.prompter import dpa_p2pnet as dpa
from medsam2_tpu.prompter.matcher import MatcherConfig, hungarian_match
from medsam2_tpu.prompter.criterion import CriterionConfig, criterion_losses


def test_grid_sample_matches_torch(rng):
    feat = rng.standard_normal((2, 8, 10, 4)).astype(np.float32)
    coords = (rng.random((2, 7, 2)) * 2 - 1).astype(np.float32)
    got = np.asarray(dpa.grid_sample_points(jnp.asarray(feat), jnp.asarray(coords)))
    # torch grid_sample wants NCHW + grid [B, H_out, W_out, 2]
    want = F.grid_sample(
        torch.from_numpy(feat).permute(0, 3, 1, 2),
        torch.from_numpy(coords)[:, :, None, :],
        mode="bilinear", align_corners=True,
    )[:, :, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_anchor_points_matches_reference_semantics():
    # oracle re-derived from AnchorPoints.forward (dpa_p2pnet.py:48-60)
    h, w, space = 64, 80, 16
    got = dpa.anchor_points(h, w, space)
    anchors = np.stack(np.meshgrid(np.arange(np.ceil(w / space)),
                                   np.arange(np.ceil(h / space))), -1) * space
    origin = np.array([w % space or space, h % space or space]) / 2
    want = (anchors + origin).reshape(-1, 2)
    np.testing.assert_allclose(got, want)
    assert got.shape == ((h // space) * (w // space), 2)


def test_prompter_forward_shapes(rng):
    cfg = dpa.PrompterConfig(backbone="resnet18", num_classes=1)
    params = dpa.prompter_init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    out, feats = dpa.prompter_apply(params, cfg, imgs)
    N = (64 // 16) ** 2
    assert out["pred_coords"].shape == (1, N, 2)
    assert out["pred_logits"].shape == (1, N, 2)
    assert out["pred_masks"].shape == (1, 64, 64)
    assert len(feats) == 4
    # SR_PFO path with a SAM semantic feature
    sem = jnp.asarray(rng.random((1, 4, 4, 256)).astype(np.float32))
    out2, _ = dpa.prompter_apply(params, cfg, imgs, sem)
    assert out2["pred_coords"].shape == (1, N, 2)
    assert not np.allclose(np.asarray(out["pred_logits"]),
                           np.asarray(out2["pred_logits"]))


def test_hungarian_matcher_vs_direct(rng):
    from scipy.optimize import linear_sum_assignment
    mcfg = MatcherConfig(cost_point=0.1, cost_class=1.0)
    B, N, M, C = 1, 12, 3, 2
    pred_coords = rng.random((B, N, 2)).astype(np.float32) * 64
    pred_logits = rng.standard_normal((B, N, C)).astype(np.float32)
    gt_points = rng.random((B, M, 2)).astype(np.float32) * 64
    gt_labels = np.zeros((B, M), np.int32)
    gt_valid = np.ones((B, M), bool)

    src = np.asarray(hungarian_match(
        mcfg, jnp.asarray(pred_coords), jnp.asarray(pred_logits),
        jnp.asarray(gt_points), jnp.asarray(gt_labels), jnp.asarray(gt_valid)))

    prob = torch.softmax(torch.from_numpy(pred_logits[0]), -1).numpy()
    cost = (0.1 * np.linalg.norm(
        pred_coords[0][:, None] - gt_points[0][None], axis=-1)
        - 1.0 * prob[:, gt_labels[0]])
    rows, cols = linear_sum_assignment(cost)
    want = np.zeros(M, np.int32)
    want[cols] = rows
    np.testing.assert_array_equal(src[0], want)

    # padding slot excluded
    gt_valid2 = gt_valid.copy()
    gt_valid2[0, -1] = False
    src2 = np.asarray(hungarian_match(
        mcfg, jnp.asarray(pred_coords), jnp.asarray(pred_logits),
        jnp.asarray(gt_points), jnp.asarray(gt_labels), jnp.asarray(gt_valid2)))
    assert src2[0, -1] == -1


def test_host_matcher_matches_callback_matcher(rng):
    """The precompute-mode host matcher (for backends without pure_callback,
    e.g. the axon TPU tunnel) must produce identical assignments."""
    from medsam2_tpu.prompter.matcher import hungarian_match_host
    mcfg = MatcherConfig(cost_point=0.1, cost_class=1.0)
    B, N, M, C = 2, 16, 5, 2
    pred_coords = rng.random((B, N, 2)).astype(np.float32) * 64
    pred_logits = rng.standard_normal((B, N, C)).astype(np.float32)
    gt_points = rng.random((B, M, 2)).astype(np.float32) * 64
    gt_labels = np.zeros((B, M), np.int32)
    gt_valid = np.ones((B, M), bool)
    gt_valid[1, 3:] = False

    via_callback = np.asarray(hungarian_match(
        mcfg, jnp.asarray(pred_coords), jnp.asarray(pred_logits),
        jnp.asarray(gt_points), jnp.asarray(gt_labels), jnp.asarray(gt_valid)))
    via_host = hungarian_match_host(mcfg, pred_coords, pred_logits, gt_points,
                                    gt_labels, gt_valid)
    np.testing.assert_array_equal(via_callback, via_host)


def test_nuclei_train_step_precompute_mode(rng):
    """The precompute matcher mode trains end-to-end (same losses path)."""
    from tests.test_predictors import TINY
    from medsam2_tpu.state import similarity_bank as sb
    from medsam2_tpu.train import recipe_nuclei as rn

    rcfg = rn.NucleiRecipeConfig(
        prompter=dpa.PrompterConfig(backbone="resnet18"),
        memory_bank_size=4, max_cells=4, out_size=64)
    params = rn.init_joint_params(jax.random.PRNGKey(0), TINY, rcfg)
    tx = rn.make_optimizer_nuclei(rcfg)
    step = rn.make_train_step_nuclei(TINY, rcfg, tx, matcher_mode="precompute")
    opt_state = tx.init(params)
    B, M, S = 1, 4, 64
    gt_points = np.zeros((B, M, 2), np.float32)
    gt_points[0, 0] = [20, 20]
    gt_valid = np.zeros((B, M), bool)
    gt_valid[0, 0] = True
    cell_masks = np.zeros((B, M, 64, 64), np.float32)
    cell_masks[0, 0, 14:26, 14:26] = 1
    batch = {
        "images": jnp.asarray(rng.random((B, S, S, 3)).astype(np.float32)),
        "gt_points": jnp.asarray(gt_points),
        "gt_labels": jnp.zeros((B, M), jnp.int32),
        "gt_valid": jnp.asarray(gt_valid),
        "gt_cell_masks": jnp.asarray(cell_masks),
        "gt_semantic": jnp.asarray(cell_masks.max(1)),
    }
    spec_P = (TINY.image_size // 16) ** 2
    bank = sb.init_similarity_bank(4, spec_P, TINY.mem_dim, spec_P * 256)
    params, opt_state, bank, metrics = step(
        params, opt_state, batch, bank, jax.random.PRNGKey(1), bank_nonempty=False)
    assert np.isfinite(float(metrics["loss"]))


def test_criterion_perfect_match_low_loss(rng):
    ccfg = CriterionConfig(num_classes=1)
    B, N, M, S = 1, 8, 2, 16
    gt_points = jnp.asarray(rng.random((B, M, 2)).astype(np.float32) * 60)
    pred_coords = jnp.zeros((B, N, 2)).at[:, :M].set(gt_points)
    logits = jnp.full((B, N, 2), 0.0).at[:, :M, 0].set(8.0).at[:, M:, 1].set(8.0)
    outputs = {
        "pred_coords": pred_coords,
        "pred_logits": logits,
        "pred_masks": jnp.full((B, S, S), -10.0),
    }
    src_idx = jnp.asarray([[0, 1]])
    gt = jnp.zeros((B, S, S))
    sam_pred = jnp.full((B * M // B * B, S, S), -10.0)  # hmm simple: M cells
    sam_pred = jnp.full((M, S, S), -10.0)
    sam_gt = jnp.zeros((M, S, S))
    losses = criterion_losses(
        ccfg, outputs, gt_points, jnp.zeros((B, M), jnp.int32),
        jnp.ones((B, M), bool), gt, src_idx, sam_pred,
        jnp.zeros((M,)), sam_gt)
    assert float(losses["loss_reg"]) == pytest.approx(0.0, abs=1e-5)
    assert float(losses["loss_cls"]) < 0.1
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_nuclei_train_step(rng):
    from tests.test_predictors import TINY
    from medsam2_tpu.state import similarity_bank as sb
    from medsam2_tpu.train import recipe_nuclei as rn

    rcfg = rn.NucleiRecipeConfig(
        prompter=dpa.PrompterConfig(backbone="resnet18"),
        memory_bank_size=4, max_cells=4, out_size=64)
    params = rn.init_joint_params(jax.random.PRNGKey(0), TINY, rcfg)
    tx = rn.make_optimizer_nuclei(rcfg)
    step = rn.make_train_step_nuclei(TINY, rcfg, tx)  # jitted inside
    opt_state = tx.init(params)

    B, M, S = 1, 4, 64
    gt_points = np.zeros((B, M, 2), np.float32)
    gt_points[0, 0] = [20, 20]
    gt_points[0, 1] = [44, 44]
    gt_valid = np.zeros((B, M), bool)
    gt_valid[0, :2] = True
    cell_masks = np.zeros((B, M, 64, 64), np.float32)
    cell_masks[0, 0, 14:26, 14:26] = 1
    cell_masks[0, 1, 38:50, 38:50] = 1
    batch = {
        "images": jnp.asarray(rng.random((B, S, S, 3)).astype(np.float32)),
        "gt_points": jnp.asarray(gt_points),
        "gt_labels": jnp.zeros((B, M), jnp.int32),
        "gt_valid": jnp.asarray(gt_valid),
        "gt_cell_masks": jnp.asarray(cell_masks),
        "gt_semantic": jnp.asarray(cell_masks.max(1)[:, :, :]),
    }
    spec_P = (TINY.image_size // 16) ** 2
    bank = sb.init_similarity_bank(rcfg.memory_bank_size, spec_P, TINY.mem_dim,
                                   spec_P * 256)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, bank, metrics = step(
            params, opt_state, batch, bank, sub, bank_nonempty=(i > 0))
        assert np.isfinite(float(metrics["loss"])), metrics
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

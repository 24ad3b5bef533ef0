"""Regression tests for the round-1 advisor findings (ADVICE.md).

Each test pins a behavior that was silently wrong before the fix:
- padded GT slots in ``loss_cls`` aliased to query 0 and overwrote its label
- ``_match_host`` assumed prefix-packed GT validity columns
- ``remove_small_regions`` used <= instead of < and kept the whole mask when
  every island was small (reference keeps only the largest component)
- preprocessing resize now antialiases downscales like torchvision Resize
"""

import numpy as np
import jax.numpy as jnp
import pytest


def test_loss_cls_padding_does_not_alias_query0():
    from medsam2_tpu.prompter.criterion import CriterionConfig, loss_cls

    ccfg = CriterionConfig(num_classes=1, eos_coef=0.3)
    B, N, M = 1, 4, 3
    # GT 0 (valid, label 0) is matched to prediction 0; slots 1,2 are padding.
    src_idx = jnp.array([[0, -1, -1]], jnp.int32)
    gt_valid = jnp.array([[True, False, False]])
    gt_labels = jnp.zeros((B, M), jnp.int32)
    # logits that strongly predict class 0 for query 0, background elsewhere
    logits = np.zeros((B, N, 2), np.float32)
    logits[:, :, 1] = 10.0
    logits[0, 0] = [10.0, 0.0]
    loss = float(loss_cls(jnp.asarray(logits), gt_labels, src_idx, gt_valid, ccfg))
    # With the aliasing bug, query 0's target was overwritten with background
    # (weight eos_coef on a ~10-nll term dominates). Correct target: class 0,
    # which the logits nail, so the loss must be tiny.
    assert loss < 0.1, loss


def test_match_host_non_prefix_packed_validity():
    from medsam2_tpu.prompter.matcher import _match_host

    B, N, M = 1, 3, 3
    cost = np.full((B, N, M), 1e9)
    # valid GT live in columns 0 and 2 (column 1 is padding)
    cost[0, :, 0] = [0.0, 5.0, 5.0]   # best: prediction 0
    cost[0, :, 2] = [5.0, 5.0, 0.0]   # best: prediction 2
    gt_valid = np.array([[True, False, True]])
    out = _match_host(cost, gt_valid)
    assert out[0, 0] == 0
    assert out[0, 1] == -1
    assert out[0, 2] == 2


def test_remove_small_regions_strict_threshold():
    from medsam2_tpu.ops.connected_components import remove_small_regions

    mask = np.zeros((16, 16), bool)
    mask[2:4, 2:4] = True  # area exactly 4
    out, changed = remove_small_regions(jnp.asarray(mask), area_thresh=4.0,
                                        mode="islands")
    # area == thresh is NOT small under the reference's strict <
    assert not bool(changed)
    np.testing.assert_array_equal(np.asarray(out), mask)


def test_remove_small_regions_all_small_keeps_largest():
    from medsam2_tpu.ops.connected_components import remove_small_regions

    mask = np.zeros((16, 16), bool)
    mask[1:3, 1:3] = True       # area 4
    mask[8:11, 8:11] = True     # area 9 (largest)
    out, changed = remove_small_regions(jnp.asarray(mask), area_thresh=100.0,
                                        mode="islands")
    assert bool(changed)
    out = np.asarray(out)
    assert not out[1:3, 1:3].any()
    assert out[8:11, 8:11].all()
    assert out.sum() == 9


def test_remove_small_regions_holes():
    from medsam2_tpu.ops.connected_components import remove_small_regions

    mask = np.ones((16, 16), bool)
    mask[5, 5] = False               # 1-px hole: filled
    mask[10:14, 10:14] = False       # 16-px hole: kept (16 >= 10)
    out, changed = remove_small_regions(jnp.asarray(mask), area_thresh=10.0,
                                        mode="holes")
    assert bool(changed)
    out = np.asarray(out)
    assert out[5, 5]
    assert not out[10:14, 10:14].any()


def test_preprocess_downscale_antialiases():
    from medsam2_tpu.utils.transforms import SAM2Transforms

    # a 1-px-period checkerboard downscaled 4x: without antialias the result
    # aliases to near-solid values; with antialias it averages toward the mean
    img = np.zeros((64, 64, 3), np.uint8)
    img[::2, :] = 255
    tfm = SAM2Transforms(resolution=16)
    out = np.asarray(tfm(img))
    # undo the ImageNet normalize on channel 0
    val = out[..., 0] * 0.229 + 0.485
    assert np.all(np.abs(val - 0.5) < 0.2), (val.min(), val.max())

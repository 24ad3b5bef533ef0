"""Nuclei training augmentation tests (VERDICT r1 #4): geometry consistency
between the augmented image, instance map and the per-cell prompts derived
from it; seedability; crop/pad shapes."""

import numpy as np
import pytest

from medsam2_tpu.data.augment import (
    NucleiAugmentConfig, augment_nuclei, color_jitter, random_crop_pair)
from medsam2_tpu.data.monuseg import cell_centers


def _toy_tile(rng, H=400, W=380, n_cells=25):
    img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    inst = np.zeros((H, W), np.int32)
    for pid in range(1, n_cells + 1):
        cy, cx = rng.integers(10, H - 10), rng.integers(10, W - 10)
        r = int(rng.integers(3, 8))
        yy, xx = np.ogrid[:H, :W]
        inst[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = pid
    return img, inst


def test_crop_shapes_and_padding(rng):
    img, inst = _toy_tile(rng)
    ci, cm = random_crop_pair(img, inst, 256, rng)
    assert ci.shape == (256, 256, 3) and cm.shape == (256, 256)
    # smaller-than-crop source pads reflectively
    ci, cm = random_crop_pair(img[:100, :120], inst[:100, :120], 256, rng)
    assert ci.shape == (256, 256, 3) and cm.shape == (256, 256)


def test_augment_geometry_consistency(rng):
    """Cells re-derived from the augmented inst map are self-consistent: every
    center lies inside its own cell (the invariant the recipe depends on)."""
    img, inst = _toy_tile(rng)
    cfg = NucleiAugmentConfig(crop_size=256)
    for seed in range(5):
        r = np.random.default_rng(seed)
        aimg, ainst = augment_nuclei(img, inst, cfg, r)
        assert aimg.shape == (256, 256, 3) and ainst.shape == (256, 256)
        assert aimg.dtype == np.float32 and ainst.dtype == np.int32
        pids = np.unique(ainst)
        pids = pids[pids > 0]
        if len(pids) == 0:
            continue
        pts = cell_centers(ainst, pids)
        for (x, y), pid in zip(pts.astype(int), pids):
            assert ainst[y, x] == pid


def test_augment_seedable_and_stochastic(rng):
    img, inst = _toy_tile(rng)
    cfg = NucleiAugmentConfig(crop_size=128)
    a1, m1 = augment_nuclei(img, inst, cfg, np.random.default_rng(3))
    a2, m2 = augment_nuclei(img, inst, cfg, np.random.default_rng(3))
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(m1, m2)
    a3, m3 = augment_nuclei(img, inst, cfg, np.random.default_rng(4))
    assert not (np.array_equal(a1, a3) and np.array_equal(m1, m3))


def test_crop_retry_keeps_cells(rng):
    """With a single tiny cell in a big tile, retries should usually land it;
    at minimum the retry loop never errors and returns valid shapes."""
    H = W = 600
    img = np.zeros((H, W, 3), np.uint8)
    inst = np.zeros((H, W), np.int32)
    inst[300:306, 300:306] = 1
    cfg = NucleiAugmentConfig(crop_size=64, min_cell_retries=64,
                              p_color=0.0)
    hits = 0
    for seed in range(10):
        _, m = augment_nuclei(img, inst, cfg, np.random.default_rng(seed))
        hits += int(m.max() > 0)
    assert hits >= 5  # 64 retries at ~1.2% hit rate/try -> ~54% per sample


def test_color_jitter_bounds(rng):
    img = rng.random((64, 64, 3)).astype(np.float32) * 255
    cfg = NucleiAugmentConfig()
    out = color_jitter(img, cfg, np.random.default_rng(0))
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert not np.allclose(out, img)


def test_dataset_train_mode_with_augment(rng, tmp_path):
    """MONUSEG with augment=True: items come out crop-sized with in-cell
    prompt points."""
    import scipy.io as sio
    from PIL import Image

    root = tmp_path / "train"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    img, inst = _toy_tile(rng, H=320, W=320)
    Image.fromarray(img).save(root / "images" / "a.png")
    sio.savemat(root / "labels" / "a.mat", {"inst_map": inst})

    from medsam2_tpu.data.monuseg import MONUSEG
    ds = MONUSEG(str(tmp_path), "train", image_size=256, out_size=256,
                 seed=0, augment=True)
    item = ds[0]
    assert item["image"].shape == (256, 256, 3)
    assert item["binary_mask"].shape == (256, 256)
    n = item["cell_num"]
    for c in range(n):
        x, y = item["points_choose"][c].astype(int)
        assert item["inst_masks"][c][y, x]

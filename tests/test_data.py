"""Data layer tests: prompt samplers, dataset contracts on synthetic + on-disk
fixtures, batch packing, loader."""

import os

import numpy as np
import pytest

from medsam2_tpu.data import prompts, synthetic
from medsam2_tpu.data.btcv import BTCV, AMOS, pack_to_recipe_batch
from medsam2_tpu.data.refuge import REFUGE, pack_refuge_batch
from medsam2_tpu.data.monuseg import MONUSEG, pack_nuclei_batch, cell_centers
from medsam2_tpu.data.loader import DataLoader


def test_random_click_in_mask(rng):
    m = np.zeros((32, 32), np.int32)
    m[10:20, 5:15] = 1
    lbl, pt = prompts.random_click(m, 1, rng)
    assert lbl == 1
    x, y = int(pt[0]), int(pt[1])
    assert m[y, x] == 1  # (x, y) convention

    lbl0, _ = prompts.random_click(np.zeros((8, 8), np.int32), 1, rng)
    assert lbl0 == 0


def test_generate_bbox(rng):
    m = np.zeros((32, 32), np.int32)
    m[10:20, 5:15] = 1
    box = prompts.generate_bbox(m, 0.0, rng)
    np.testing.assert_array_equal(box, [5, 10, 14, 19])  # [y0,x0,y1,x1] ref-style
    pts = prompts.bbox_to_xyxy(box)
    np.testing.assert_array_equal(pts, [[5, 10], [14, 19]])  # (x, y) corners
    nan_box = prompts.generate_bbox(np.zeros((8, 8), np.int32))
    assert np.all(np.isnan(nan_box))


def test_synthetic_volume_contract(rng):
    vol = synthetic.synthetic_volume(rng, T=4, size=64, num_objects=2)
    assert vol["image"].shape == (4, 3, 64, 64)
    assert set(vol["label"][0].keys()) <= {1, 2}
    batch = pack_to_recipe_batch([vol], video_length=4, num_objects=2,
                                 prompt_freq=2, image_size=64)
    assert batch["images"].shape == (1, 4, 64, 64, 3)
    assert batch["gt_masks"].shape == (1, 4, 2, 64, 64)
    assert batch["obj_valid"].any()
    # bbox prompts populate 2 corner labels
    assert (batch["prompt_labels"][0, :, :, :2] >= 0).any()


def test_btcv_on_disk(tmp_path, rng):
    # build a 2-case BTCV-layout fixture from synthetic volumes
    from PIL import Image
    for case in ["case0", "case1"]:
        os.makedirs(tmp_path / "Training" / "image" / case)
        os.makedirs(tmp_path / "Training" / "mask" / case)
        vol = synthetic.synthetic_volume(rng, T=5, size=48)
        for t in range(5):
            Image.fromarray(
                vol["image"][t].transpose(1, 2, 0).astype(np.uint8)).save(
                tmp_path / "Training" / "image" / case / f"{t}.jpg")
            mask = np.zeros((48, 48), np.int32)
            for obj, m in vol["label"][t].items():
                mask[m[0] > 0] = obj
            np.save(tmp_path / "Training" / "mask" / case / f"{t}.npy", mask)
    ds = BTCV(str(tmp_path), "Training", image_size=48, video_length=3,
              prompt="bbox", seed=0)
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (3, 3, 48, 48)
    assert isinstance(s["label"], dict) and isinstance(s["bbox"], dict)
    assert AMOS is BTCV  # reference AMOS is a copy of BTCV


def test_refuge_on_disk(tmp_path, rng):
    from PIL import Image
    sample = synthetic.synthetic_fundus(rng, size=64)
    name = "g0001"
    d = tmp_path / "Training-400" / name
    os.makedirs(d)
    Image.fromarray((sample["image"].transpose(1, 2, 0) * 255).astype(np.uint8)).save(
        d / f"{name}_cropped.jpg")
    for i in range(1, 8):
        Image.fromarray((sample["mask"][0] * 255).astype(np.uint8)).save(
            d / f"{name}_seg_cup_{i}_cropped.jpg")
    ds = REFUGE(str(tmp_path), "Training", image_size=64, out_size=64, seed=0)
    s = ds[0]
    assert s["image"].shape == (3, 64, 64)
    assert s["multi_rater"].shape == (7, 1, 64, 64)
    assert s["mask"].shape == (1, 64, 64)
    batch = pack_refuge_batch([s], 64, 64)
    assert batch["images"].shape == (1, 64, 64, 3)
    assert batch["labels"][0, 0] == 1


def test_monuseg_on_disk(tmp_path, rng):
    import scipy.io as sio
    from PIL import Image
    sample = synthetic.synthetic_nuclei(rng, size=64, num_cells=5)
    os.makedirs(tmp_path / "train" / "images")
    os.makedirs(tmp_path / "train" / "labels")
    Image.fromarray((sample["image"] * 255).astype(np.uint8)).save(
        tmp_path / "train" / "images" / "im0.png")
    sio.savemat(tmp_path / "train" / "labels" / "im0.mat",
                {"inst_map": sample["inst_map"]})
    ds = MONUSEG(str(tmp_path), "train", image_size=64, out_size=64, seed=0)
    s = ds[0]
    assert s["cell_num"] >= 3
    assert s["points_choose"].shape[1] == 2
    assert s["inst_masks"].shape[0] == s["cell_num"]
    batch = pack_nuclei_batch([s], 64, 64, max_cells=8)
    assert batch["gt_valid"][0].sum() == min(s["cell_num"], 8)
    assert batch["gt_semantic"].max() == 1.0


def test_cell_centers_snaps_to_foreground():
    inst = np.zeros((20, 20), np.int32)
    # C-shaped cell whose centroid falls on background
    inst[5:15, 5:7] = 1
    inst[5:7, 5:15] = 1
    inst[13:15, 5:15] = 1
    pts = cell_centers(inst, np.array([1]))
    x, y = int(pts[0, 0]), int(pts[0, 1])
    assert inst[y, x] == 1


def test_device_prefetch():
    from medsam2_tpu.data.loader import device_prefetch
    import numpy as np

    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i  # order preserved, on-device arrays


def test_profiler_writes_trace(tmp_path):
    import jax
    from medsam2_tpu.utils.logging_utils import Profiler

    prof = Profiler(str(tmp_path), num_steps=2)
    for _ in range(3):
        jax.block_until_ready(jax.numpy.ones((8, 8)) * 2)
        prof.step()
    prof.close()
    import glob
    assert glob.glob(str(tmp_path / "**" / "*"), recursive=True), "no trace written"


def test_dataloader_prefetch(rng):
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return i

    dl = DataLoader(DS(), batch_size=3, shuffle=True, num_workers=2, seed=0)
    batches = list(dl)
    assert len(batches) == 4
    got = sorted(x for b in batches for x in b)
    assert got == list(range(10))

"""NIfTI reader/writer round trip + the raw-CT volume dataset adapter."""

import os

import numpy as np
import pytest

from medsam2_tpu.data import nifti


def test_nifti_roundtrip(tmp_path, rng):
    for dtype, suffix in [(np.int16, ".nii"), (np.float32, ".nii.gz"),
                          (np.uint8, ".nii.gz")]:
        vol = (rng.random((7, 6, 5)) * 100).astype(dtype)
        p = str(tmp_path / f"vol_{np.dtype(dtype).name}{suffix}")
        nifti.save_nifti(p, vol, pixdim=(1.5, 1.5, 3.0))
        back, hdr = nifti.load_nifti(p)
        np.testing.assert_array_equal(back, vol)
        assert hdr["shape"] == vol.shape
        assert hdr["pixdim"][2] == pytest.approx(3.0)


def test_nifti_big_endian_and_scaling(tmp_path, rng):
    # hand-build a big-endian file with scl_slope/inter
    import struct
    vol = (rng.random((4, 3, 2)) * 50).astype(np.int16)
    hdr = bytearray(352)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 4, 3, 2, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 4)
    struct.pack_into(">h", hdr, 72, 16)
    struct.pack_into(">f", hdr, 108, 352.0)
    struct.pack_into(">f", hdr, 112, 2.0)   # slope
    struct.pack_into(">f", hdr, 116, -10.0)  # inter
    hdr[344:348] = b"n+1\x00"
    p = str(tmp_path / "be.nii")
    with open(p, "wb") as f:
        f.write(bytes(hdr) + vol.astype(">i2").tobytes(order="F"))
    back, h = nifti.load_nifti(p)
    np.testing.assert_allclose(back, vol.astype(np.float32) * 2.0 - 10.0)
    assert h["byteorder"] == ">"


def test_ct_window():
    v = np.array([-1000.0, -160.0, 40.0, 240.0, 3000.0])
    w = nifti.ct_window(v)  # center 40 width 400 -> [-160, 240]
    assert w[0] == 0 and w[1] == 0 and w[4] == 255 and w[3] == 255
    assert w[2] == 127 or w[2] == 128


def test_nifti_volume_dataset(tmp_path, rng):
    os.makedirs(tmp_path / "imagesTr")
    os.makedirs(tmp_path / "labelsTr")
    Z = 10
    vol = (rng.random((32, 32, Z)) * 400 - 160).astype(np.float32)
    seg = np.zeros((32, 32, Z), np.uint8)
    seg[8:20, 8:20, 3:8] = 1     # object 1 on slices 3..7
    seg[22:28, 22:28, 4:7] = 2   # object 2 on slices 4..6
    nifti.save_nifti(str(tmp_path / "imagesTr" / "case0.nii.gz"), vol)
    nifti.save_nifti(str(tmp_path / "labelsTr" / "case0.nii.gz"), seg)

    ds = nifti.NiftiVolumes(str(tmp_path), mode="Training", image_size=64,
                            video_length=4, prompt="click", seed=0)
    assert len(ds) == 1
    s = ds[0]
    assert s["image"].shape == (4, 3, 64, 64)
    # empty slices trimmed to the 3..7 labeled band
    imgs2, seg2 = ds._load_volume(ds.name_list[0])
    assert seg2.shape[-1] == 5 and imgs2.shape[0] == 5
    # object masks + prompts present for frames containing object 1
    found = [t for t in s["label"] if 1 in s["label"][t]]
    assert found
    t0 = found[0]
    assert s["label"][t0][1].shape == (1, 64, 64)
    assert 1 in s["p_label"][t0]

    # bbox mode
    ds2 = nifti.NiftiVolumes(str(tmp_path), mode="Training", image_size=64,
                             video_length=4, prompt="bbox", seed=0)
    s2 = ds2[0]
    t1 = [t for t in s2["label"] if 1 in s2["label"][t]][0]
    assert s2["bbox"][t1][1].shape == (4,)

    # Test mode without an imagesTs split must refuse (silent fallback to the
    # training volumes would leak train data into validation metrics)
    with pytest.raises(FileNotFoundError):
        nifti.NiftiVolumes(str(tmp_path), mode="Test", image_size=64)


@pytest.mark.slow
def test_train_3d_cli_nifti(tmp_path, rng):
    """train_3d end-to-end from raw .nii.gz volumes via -dataset btcv_nifti."""
    import glob

    root = tmp_path / "data"
    for split in ("imagesTr", "labelsTr", "imagesTs", "labelsTs"):
        os.makedirs(root / split)
    for case in ("a", "b"):
        vol = (rng.random((24, 24, 8)) * 400 - 160).astype(np.float32)
        seg = np.zeros((24, 24, 8), np.uint8)
        seg[6:18, 6:18, 1:7] = 1
        for imgs, lbls in (("imagesTr", "labelsTr"), ("imagesTs", "labelsTs")):
            nifti.save_nifti(str(root / imgs / f"{case}.nii.gz"), vol)
            nifti.save_nifti(str(root / lbls / f"{case}.nii.gz"), seg)

    args = [
        "-dataset", "btcv_nifti", "-data_path", str(root),
        "-image_size", "64", "-video_length", "4",
        "-prompt_freq", "2", "-prompt", "bbox", "-max_objects", "1",
        "-epochs", "1", "-steps_per_epoch", "1", "-val_freq", "0",
        "-sam_config", "sam2_hiera_t", "-logdir", str(tmp_path / "log"),
        "-b", "1", "-print_freq", "1",
    ]
    import medsam2_tpu.cli.train_3d as t3
    from tests.test_predictors import TINY
    orig = t3.get_config
    t3.get_config = lambda name, **kw: TINY
    try:
        params = t3.main(args)
    finally:
        t3.get_config = orig
    assert params is not None
    assert glob.glob(str(tmp_path / "log" / "*" / "Model" / "step_*"))

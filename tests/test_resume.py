"""Checkpoint resume: train -> save -> resume restores params, optimizer state,
and epoch counter."""

import glob

import numpy as np
import pytest


@pytest.mark.slow
def test_train_3d_resume(tmp_path):
    import medsam2_tpu.cli.train_3d as t3
    from tests.test_predictors import TINY

    base_args = [
        "-dataset", "synthetic", "-image_size", "64", "-video_length", "4",
        "-prompt_freq", "2", "-prompt", "bbox", "-max_objects", "2",
        "-steps_per_epoch", "1", "-val_freq", "1", "-b", "1",
        "-logdir", str(tmp_path),
    ]
    orig = t3.get_config
    t3.get_config = lambda name, **kw: TINY
    try:
        t3.main(base_args + ["-epochs", "1"])
        ckpts = sorted(glob.glob(str(tmp_path / "*" / "Model")))
        assert ckpts
        params2 = t3.main(base_args + ["-epochs", "2", "-resume", ckpts[0]])
    finally:
        t3.get_config = orig
    assert params2 is not None

"""CLI smoke tests: both trainers run end-to-end on synthetic data with tiny
settings, produce finite losses, validate, and write checkpoints."""

import glob
import os

import numpy as np
import pytest

from medsam2_tpu.cli import train_2d, train_3d
from medsam2_tpu.checkpoint.store import latest_step, restore_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path, rng):
    state = {
        "params": {"w": rng.standard_normal((4, 4)).astype(np.float32),
                   "nested": {"b": np.zeros(3, np.float32)}},
        "epoch": 3,
    }
    save_checkpoint(str(tmp_path), state, 3)
    assert latest_step(str(tmp_path)) == 3
    back = restore_checkpoint(str(tmp_path))
    np.testing.assert_allclose(np.asarray(back["params"]["w"]), state["params"]["w"])
    assert int(back["epoch"]) == 3


@pytest.mark.slow
def test_train_3d_cli_synthetic(tmp_path):
    args = [
        "-dataset", "synthetic", "-image_size", "64", "-video_length", "4",
        "-prompt_freq", "2", "-prompt", "bbox", "-max_objects", "2",
        "-epochs", "1", "-steps_per_epoch", "2", "-val_freq", "1",
        "-sam_config", "sam2_hiera_t", "-logdir", str(tmp_path), "-b", "1",
        "-print_freq", "1",
    ]
    # shrink the model for CI speed by patching the preset
    import medsam2_tpu.cli.train_3d as t3
    from tests.test_predictors import TINY
    orig = t3.get_config
    t3.get_config = lambda name, **kw: TINY
    try:
        params = t3.main(args)
    finally:
        t3.get_config = orig
    assert params is not None
    ckpts = glob.glob(str(tmp_path / "*" / "Model" / "step_*"))
    assert ckpts, "no checkpoint written"


@pytest.mark.slow
def test_train_2d_cli_synthetic(tmp_path):
    args = [
        "-dataset", "synthetic", "-net", "sam2", "-image_size", "64",
        "-out_size", "64", "-epochs", "1", "-steps_per_epoch", "2",
        "-val_freq", "1", "-logdir", str(tmp_path), "-b", "2",
    ]
    import medsam2_tpu.cli.train_2d as t2
    from tests.test_predictors import TINY
    orig = t2.get_config
    t2.get_config = lambda name, **kw: TINY
    try:
        params = t2.main(args)
    finally:
        t2.get_config = orig
    assert params is not None


@pytest.mark.slow
def test_nuclei_inference_multi_crop(rng):
    """Sliding-window inference over an image larger than the crop size:
    multiple crops, global point NMS, cross-crop merge."""
    import jax
    from tests.test_predictors import TINY
    from medsam2_tpu.data.synthetic import synthetic_nuclei
    from medsam2_tpu.train import recipe_nuclei
    from medsam2_tpu.prompter.dpa_p2pnet import PrompterConfig
    from medsam2_tpu.api.nuclei_inference import crop_with_overlap, predict_instances
    from medsam2_tpu.state import similarity_bank as sb

    corners = crop_with_overlap(128, 128, 64, 16)
    assert len(corners) > 1 and (0, 0) in corners
    xs = {c[0] for c in corners}
    assert max(xs) + 64 >= 128  # full coverage

    rcfg = recipe_nuclei.NucleiRecipeConfig(
        prompter=PrompterConfig(backbone="resnet18"), max_cells=8, out_size=64)
    params = recipe_nuclei.init_joint_params(jax.random.PRNGKey(0), TINY, rcfg)
    sample = synthetic_nuclei(rng, size=128, num_cells=8)
    P = (TINY.image_size // 16) ** 2
    bank = sb.init_similarity_bank(4, P, TINY.mem_dim, P * 256)
    inst = predict_instances(params, TINY, rcfg, sample, bank,
                             jax.random.PRNGKey(1), crop_size=64, overlap=16)
    assert inst.shape == (128, 128)
    assert inst.min() >= 0


@pytest.mark.slow
def test_nuclei_inference_engine(rng):
    """predict_instances produces a sane instance map on synthetic nuclei."""
    import jax
    from tests.test_predictors import TINY
    from medsam2_tpu.data.synthetic import synthetic_nuclei
    from medsam2_tpu.train import recipe_nuclei
    from medsam2_tpu.prompter.dpa_p2pnet import PrompterConfig
    from medsam2_tpu.api.nuclei_inference import predict_instances
    from medsam2_tpu.state import similarity_bank as sb

    rcfg = recipe_nuclei.NucleiRecipeConfig(
        prompter=PrompterConfig(backbone="resnet18"), max_cells=8, out_size=64)
    params = recipe_nuclei.init_joint_params(jax.random.PRNGKey(0), TINY, rcfg)
    sample = synthetic_nuclei(rng, size=64, num_cells=5)
    P = (TINY.image_size // 16) ** 2
    bank = sb.init_similarity_bank(4, P, TINY.mem_dim, P * 256)
    inst = predict_instances(params, TINY, rcfg, sample, bank,
                             jax.random.PRNGKey(1))
    assert inst.shape == (64, 64)
    assert inst.dtype == np.int32
    assert inst.min() >= 0

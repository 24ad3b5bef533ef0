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
    # per-step/epoch scalar curves land in the run dir (ScalarWriter)
    jl = glob.glob(str(tmp_path / "*" / "Log" / "scalars.jsonl"))
    assert jl and any("train/" in ln for ln in open(jl[0]))
    assert glob.glob(str(tmp_path / "*" / "Log" / "curve_*.csv"))


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


def test_nuclei_merge_semantics():
    """merge_instances reproduces the reference merge stages
    (func_2d/function.py:575-627): per-point keep-best, box NMS, and the
    reversed-order any-overlap-skips paint rule."""
    from medsam2_tpu.api.nuclei_inference import merge_instances

    H = W = 32

    def box_mask(x1, y1, x2, y2):
        m = np.zeros((H, W), bool)
        m[y1:y2, x1:x2] = True
        return m

    # same point decoded in two overlapping crops -> keep-best drops the
    # lower-scoring duplicate even though their boxes would survive NMS
    masks = [box_mask(2, 2, 8, 8), box_mask(3, 3, 9, 9), box_mask(20, 20, 26, 26)]
    boxes = np.array([[2, 2, 8, 8], [3, 3, 9, 9], [20, 20, 26, 26]], np.float32)
    scores = np.array([0.9, 0.4, 0.8], np.float32)
    pids = np.array([7, 7, 3])
    inst = merge_instances(masks, scores, boxes, pids, (H, W), mask_nms_thresh=0.99)
    assert len(np.unique(inst)) == 3          # bg + 2 instances
    assert inst[4, 4] > 0 and inst[8, 8] == 0  # the 0.9 duplicate won

    # reversed paint (ascending score): the 0.5 mask paints first; the
    # overlapping 0.9 mask still has uncovered pixels, so the reference
    # paints its WHOLE extent, overwriting the overlapped pixels
    # (function.py:624-626: paint unless b_inst_map[mask].all() != 0)
    masks = [box_mask(2, 2, 12, 12), box_mask(10, 10, 20, 20)]
    boxes = np.array([[2, 2, 12, 12], [10, 10, 20, 20]], np.float32)
    scores = np.array([0.9, 0.5], np.float32)
    pids = np.array([0, 1])
    inst = merge_instances(masks, scores, boxes, pids, (H, W), mask_nms_thresh=0.99)
    assert inst[15, 15] > 0                       # 0.5 mask keeps its
    assert inst[4, 4] > 0                         # non-overlapped extent
    assert inst[11, 11] == inst[4, 4]             # overlap stolen by 0.9 mask
    assert inst[15, 15] != inst[4, 4]
    # a mask whose every pixel is already covered is skipped and its
    # enumeration id is left as a gap (reference numbering)
    masks = [box_mask(2, 2, 8, 8), box_mask(3, 3, 7, 7)]
    boxes = np.array([[2, 2, 8, 8], [3, 3, 7, 7]], np.float32)
    scores = np.array([0.4, 0.9], np.float32)
    pids = np.array([0, 1])
    inst = merge_instances(masks, scores, boxes, pids, (H, W), mask_nms_thresh=0.99)
    # reversed order paints the 0.4 (bigger) mask first as id 1; the 0.9 mask
    # is fully covered -> skipped
    assert set(np.unique(inst)) == {0, 1}


def test_nuclei_drop_points_in_processed_boxes():
    from medsam2_tpu.api.nuclei_inference import drop_points_in_processed_boxes

    pts = np.array([[5.0, 5.0],    # strictly inside the processed box
                    [0.0, 5.0],    # on the box edge -> kept (interior test)
                    [30.0, 30.0]], np.float32)
    keep = drop_points_in_processed_boxes(pts, [(0, 0, 16, 16)])
    assert keep.tolist() == [False, True, True]
    assert drop_points_in_processed_boxes(pts, []).all()


def test_validate_nuclei_vis_dumps(tmp_path, rng, monkeypatch):
    """-vis wiring: validation writes the agreement-map + instance dumps per
    sample (reference func_2d/function.py:663-665), without running the heavy
    inference engine."""
    import types
    import medsam2_tpu.api.nuclei_inference as ni
    from medsam2_tpu.cli.train_2d import validate_nuclei
    from medsam2_tpu.data.synthetic import synthetic_nuclei
    import jax

    sample = synthetic_nuclei(rng, size=64, num_cells=4)
    monkeypatch.setattr(ni, "predict_instances",
                        lambda *a, **k: sample["inst_map"])
    args = types.SimpleNamespace(vis=True, _sample_dir=str(tmp_path))
    scores = validate_nuclei(args, None, None, None, [sample], None,
                             jax.random.PRNGKey(0))
    assert scores["dice1"] == pytest.approx(1.0)
    assert (tmp_path / "val0_compare.png").exists()
    assert (tmp_path / "val0_inst.png").exists()

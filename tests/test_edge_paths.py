"""Edge-path coverage: transforms hole filling, empty detections, predictor
error paths."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from medsam2_tpu.utils.transforms import SAM2Transforms
from medsam2_tpu.metrics.detection import eval_map
from medsam2_tpu.postproc.amg_utils import mask_to_rle


def test_transforms_postprocess_hole_filling():
    tr = SAM2Transforms(resolution=64, max_hole_area=8)
    logits = -np.ones((1, 1, 32, 32), np.float32)
    logits[0, 0, 8:24, 8:24] = 2.0
    logits[0, 0, 15:17, 15:17] = -1.0  # small hole
    out = np.asarray(tr.postprocess_masks(jnp.asarray(logits), (32, 32)))
    assert out[0, 0, 15, 15] > 0  # hole filled before resize


def test_transforms_coord_normalization():
    tr = SAM2Transforms(resolution=128)
    coords = tr.transform_coords(np.array([[50.0, 25.0]]), normalize=True,
                                 orig_hw=(100, 200))
    np.testing.assert_allclose(coords, [[32.0, 32.0]])
    boxes = tr.transform_boxes(np.array([0, 0, 200, 100]), normalize=True,
                               orig_hw=(100, 200))
    np.testing.assert_allclose(boxes, [[[0, 0], [128, 128]]])


def test_eval_map_empty_detections():
    gt = [np.array([[10, 10]], float)]
    ap, res = eval_map([np.zeros((0, 3))], gt, dis_thr=20)
    assert ap == 0.0
    assert res["num_gts"] == 1 and res["num_dets"] == 0

    # no gt, some detections -> all FPs, ap 0
    ap2, res2 = eval_map([np.array([[5, 5, 0.9]])], [np.zeros((0, 2))])
    assert ap2 == 0.0 and res2["num_gts"] == 0


def test_image_predictor_requires_set_image():
    from tests.test_predictors import TINY, tiny_params  # noqa: F401
    from medsam2_tpu.core.sam2_model import sam2_init
    from medsam2_tpu.api.image_predictor import SAM2ImagePredictor

    params = sam2_init(jax.random.PRNGKey(0), TINY)
    pred = SAM2ImagePredictor(params, TINY)
    with pytest.raises(RuntimeError, match="set_image"):
        pred.predict(point_coords=np.array([[1.0, 1.0]]),
                     point_labels=np.array([1]))
    with pytest.raises(RuntimeError, match="set_image"):
        pred.get_image_embedding()


def test_rle_empty_and_full_masks():
    empty = np.zeros((1, 8, 8), bool)
    full = np.ones((1, 8, 8), bool)
    r_empty = mask_to_rle(empty)[0]
    r_full = mask_to_rle(full)[0]
    assert r_empty["counts"] == [64]
    assert r_full["counts"] == [0, 64]

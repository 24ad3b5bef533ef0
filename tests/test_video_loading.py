"""Video session flags (VERDICT r1 #9): async JPEG loading and CPU video
offload produce identical propagation results to the synchronous device path."""

import numpy as np
import pytest
import jax.numpy as jnp

from medsam2_tpu.api.video_predictor import SAM2VideoPredictor
from tests.test_predictors import TINY, tiny_params, moving_square_video


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("frames")
    video, _ = moving_square_video(T=5, size=64)
    for t in range(video.shape[0]):
        Image.fromarray((video[t] * 255).astype(np.uint8)).save(d / f"{t}.jpg")
    return str(d)


def _propagate(pred, state):
    pred.add_new_points(state, frame_idx=0, obj_id=1,
                        points=np.array([[16., 28.]]), labels=np.array([1]))
    frames, masks = pred.propagate_in_video_batch(state)
    return frames, np.asarray(masks)


def test_async_loading_matches_sync(tiny_params, jpeg_dir):
    pred = SAM2VideoPredictor(tiny_params, TINY)

    s_sync = pred.init_state(video_path=jpeg_dir)
    f_sync, m_sync = _propagate(pred, s_sync)

    s_async = pred.init_state(video_path=jpeg_dir, async_loading_frames=True)
    assert s_async["images"] is None                      # session starts lazy
    assert s_async["num_frames"] == 5
    assert (s_async["video_height"], s_async["video_width"]) == (64, 64)
    f_async, m_async = _propagate(pred, s_async)
    assert s_async["async_loader"] is None                # materialized

    assert f_sync == f_async
    np.testing.assert_allclose(m_sync, m_async, atol=1e-6)


def test_offload_video_to_cpu(tiny_params, jpeg_dir):
    pred = SAM2VideoPredictor(tiny_params, TINY)
    s_dev = pred.init_state(video_path=jpeg_dir)
    f_dev, m_dev = _propagate(pred, s_dev)

    s_off = pred.init_state(video_path=jpeg_dir, offload_video_to_cpu=True)
    assert isinstance(s_off["images"], np.ndarray)        # stays host-side
    f_off, m_off = _propagate(pred, s_off)
    assert isinstance(s_off["images"], np.ndarray)
    assert f_dev == f_off
    np.testing.assert_allclose(m_dev, m_off, atol=1e-6)


def test_offload_with_array_input(tiny_params):
    video, _ = moving_square_video(T=4, size=64)
    pred = SAM2VideoPredictor(tiny_params, TINY)
    s = pred.init_state(images=(video * 255).astype(np.uint8),
                        offload_video_to_cpu=True,
                        offload_state_to_cpu=True)
    assert isinstance(s["images"], np.ndarray)
    _, m = _propagate(pred, s)
    assert np.isfinite(m).all()

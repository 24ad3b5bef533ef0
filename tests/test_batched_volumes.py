"""Batched multi-volume streaming tests (BASELINE config 5 shape): vmapped
propagation correctness vs the sequential predictor, and execution under a
sharded data mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.api.video_predictor import propagate_volumes_batched
from medsam2_tpu.core.sam2_model import sam2_init
from medsam2_tpu.state import memory_bank as mb
from medsam2_tpu.parallel import mesh as pmesh
from tests.test_predictors import TINY, moving_square_video


def _setup():
    params = sam2_init(jax.random.PRNGKey(0), TINY)
    spec = mb.BankSpec.from_config(TINY, max_cond_frames=1)
    return params, spec


def test_batched_matches_single_volume():
    params, spec = _setup()
    video, _ = moving_square_video(T=4)
    videos = jnp.asarray(np.stack([video, video[::-1].copy()]))
    coords = jnp.full((2, 1, 1, 2), 20.0, jnp.float32)
    coords = coords.at[0, 0, 0].set(jnp.asarray([16.0, 28.0]))
    labels = jnp.ones((2, 1, 1), jnp.int32)

    batched = propagate_volumes_batched(params, TINY, spec, videos, coords,
                                        labels, num_objects=1)
    assert batched.shape == (2, 4, 1, 1, 16, 16)
    single = propagate_volumes_batched(params, TINY, spec, videos[:1], coords[:1],
                                       labels[:1], num_objects=1)
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single[0]),
                               atol=1e-4)
    assert np.isfinite(np.asarray(batched)).all()


def test_batched_volumes_sharded_mesh():
    params, spec = _setup()
    mesh = pmesh.make_mesh(8, model_axis=1)
    video, _ = moving_square_video(T=3)
    videos = np.stack([video] * 8)
    coords = np.full((8, 1, 1, 2), 24.0, np.float32)
    labels = np.ones((8, 1, 1), np.int32)

    f = jax.jit(lambda v, c, l: propagate_volumes_batched(
        params, TINY, spec, v, c, l, num_objects=1))
    with mesh:
        vs = pmesh.shard_batch({"v": jnp.asarray(videos)}, mesh)["v"]
        cs = pmesh.shard_batch({"c": jnp.asarray(coords)}, mesh)["c"]
        ls = pmesh.shard_batch({"l": jnp.asarray(labels)}, mesh)["l"]
        out = f(vs, cs, ls)
    assert out.shape == (8, 3, 1, 1, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
    # the volume axis stays sharded over 'data'
    assert "data" in str(out.sharding.spec)
    # numerical equivalence: sharded masks == single-device masks
    single = f(jnp.asarray(videos), jnp.asarray(coords), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               rtol=1e-4, atol=1e-4,
                               err_msg="sharded streaming masks diverge from "
                                       "single-device masks")


def test_batched_bbox_multi_cond_parity_vs_predictor():
    """2 conditioning frames + bbox prompts (the BTCV eval shape: a box every
    prompt_freq frames, func_3d/function.py:98-127): the batched streaming path
    matches the unbatched SAM2VideoPredictor on the same session."""
    from medsam2_tpu.api.video_predictor import SAM2VideoPredictor

    from medsam2_tpu.utils.transforms import IMAGENET_MEAN, IMAGENET_STD

    params = sam2_init(jax.random.PRNGKey(0), TINY)
    spec = mb.BankSpec.from_config(TINY, max_cond_frames=2)
    T = 5
    video, _ = moving_square_video(T=T)
    # propagate_volumes_batched takes normalized frames; the predictor
    # normalizes internally in init_state
    video_norm = (video - IMAGENET_MEAN) / IMAGENET_STD

    # bbox = 2 corner points with labels 2/3 per prompt frame (0 and 2)
    boxes = {0: (8.0, 20.0, 24.0, 36.0), 2: (16.0, 20.0, 32.0, 36.0)}
    coords = np.zeros((1, 2, 1, 2, 2), np.float32)
    labels = np.zeros((1, 2, 1, 2), np.int32)
    for i, f in enumerate(sorted(boxes)):
        x1, y1, x2, y2 = boxes[f]
        coords[0, i, 0] = [[x1, y1], [x2, y2]]
        labels[0, i, 0] = [2, 3]

    batched = propagate_volumes_batched(
        params, TINY, spec, jnp.asarray(video_norm[None], jnp.float32),
        jnp.asarray(coords),
        jnp.asarray(labels), num_objects=1, prompt_frames=(0, 2))
    assert batched.shape == (1, T, 1, 1, 16, 16)

    pred = SAM2VideoPredictor(params, TINY, max_cond_frames=2)
    state = pred.init_state(images=video)
    for f, (x1, y1, x2, y2) in boxes.items():
        pred.add_new_bbox(state, frame_idx=f, obj_id=1,
                          bbox=np.array([[x1, y1], [x2, y2]], np.float32),
                          normalize_coords=False)
    frames, masks = pred.propagate_in_video_batch(state)
    assert frames == list(range(T))
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(masks),
                               atol=2e-3, rtol=1e-3)


def test_folded_matches_vmapped():
    """fold=True (volumes on the batch axis of one bank/scan) must reproduce
    the vmapped pipeline: 2 volumes x 2 objects, 2 conditioning frames, and
    the storage-order readout both off and on (MEDSAM2_KV_STORAGE)."""
    import os

    params, spec2 = _setup()
    spec = mb.BankSpec.from_config(TINY, max_cond_frames=2)
    T = 6
    video, _ = moving_square_video(T=T)
    videos = jnp.asarray(np.stack([video, video[::-1].copy()]))
    # [V=2, F=2, O=2, P=1, 2]
    rng = np.random.default_rng(3)
    coords = jnp.asarray(
        16.0 + 32.0 * rng.random((2, 2, 2, 1, 2)).astype(np.float32))
    labels = jnp.ones((2, 2, 2, 1), jnp.int32)

    ref = propagate_volumes_batched(params, TINY, spec, videos, coords, labels,
                                    num_objects=2, prompt_frames=(0, 3),
                                    fold=False)
    for kv in ("0", "1"):
        os.environ["MEDSAM2_KV_STORAGE"] = kv
        try:
            got = propagate_volumes_batched(params, TINY, spec, videos, coords,
                                            labels, num_objects=2,
                                            prompt_frames=(0, 3), fold=True)
        finally:
            os.environ.pop("MEDSAM2_KV_STORAGE", None)
        assert got.shape == ref.shape == (2, T, 2, 1, 16, 16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

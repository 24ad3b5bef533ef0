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

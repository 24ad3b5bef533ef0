"""Golden dump/compare tool tests."""

import numpy as np
import jax
import pytest

from medsam2_tpu.checkpoint.goldens import compare_goldens, dump_goldens
from medsam2_tpu.core.sam2_model import sam2_init
from tests.test_predictors import TINY


def test_goldens_roundtrip(tmp_path):
    params = sam2_init(jax.random.PRNGKey(0), TINY)
    g1 = dump_goldens(params, TINY)
    assert "out_low_res_multimasks" in g1 and "in_image" in g1
    # deterministic: same params + seed -> identical goldens
    g2 = dump_goldens(params, TINY)
    diffs = compare_goldens(g1, g2, atol=1e-6)
    assert max(diffs.values()) <= 1e-6

    # perturbed params must be detected
    params2 = jax.tree_util.tree_map(lambda x: x, params)
    params2["no_mem_embed"] = params["no_mem_embed"] + 0.5
    g3 = dump_goldens(params2, TINY)
    with pytest.raises(AssertionError):
        compare_goldens(g1, g3, atol=1e-3)

    # npz round trip
    np.savez_compressed(tmp_path / "g.npz", **g1)
    loaded = dict(np.load(tmp_path / "g.npz"))
    compare_goldens(g1, loaded, atol=0)

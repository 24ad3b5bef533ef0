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


def test_checkpoint_parity_dry_run(tmp_path):
    """The one-command flow for the day real ``sam2_hiera_t/s.pt`` weights
    appear (README "Checkpoint parity"), dry-run on converter-exported
    synthetic weights: export params to the reference's ``{"model":
    state_dict}`` .pt format, load it back through the torch->jax converter
    (``load_params`` auto-detects .pt), and require the module goldens to
    match the direct-params goldens to fp32 round-off."""
    torch = pytest.importorskip("torch")
    from medsam2_tpu.checkpoint.convert import export_state_dict
    from medsam2_tpu.checkpoint.store import load_params

    params = sam2_init(jax.random.PRNGKey(0), TINY)
    sd = export_state_dict(params, TINY)
    pt = tmp_path / "synthetic_sam2.pt"
    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd.items()}}, pt)

    reloaded = load_params(str(pt), TINY)
    g_direct = dump_goldens(params, TINY)
    g_loaded = dump_goldens(reloaded, TINY)
    diffs = compare_goldens(g_direct, g_loaded, atol=1e-5)
    assert diffs and max(diffs.values()) <= 1e-5

"""Torch-export interop: our params -> .pt -> torch.load -> converter -> identical."""

import numpy as np
import jax

from medsam2_tpu.checkpoint.convert import load_torch_checkpoint
from medsam2_tpu.checkpoint.export import export_to_torch
from medsam2_tpu.core.sam2_model import sam2_init
from tests.test_convert import TINY, _tree_equal


def test_torch_pt_roundtrip(tmp_path):
    params = sam2_init(jax.random.PRNGKey(7), TINY)
    path = str(tmp_path / "model.pt")
    export_to_torch(params, TINY, path)
    back = load_torch_checkpoint(path, TINY)
    _tree_equal(params, back)

"""Native checkpoint save/restore (orbax) + resume helpers.

The reference saves plain ``torch.save`` state dicts (``train_3d.py:106``,
``train_2d.py:175-179``); here native checkpoints are orbax pytrees (params,
optimizer state, step, and optionally the memory-bank state), with
``load_torch_checkpoint``/``export_state_dict`` (convert.py) bridging to the
released .pt weights.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(directory: str, state: Dict[str, Any], step: int,
                    name: Optional[str] = None) -> str:
    """Save a pytree checkpoint at ``<directory>/step_<n>`` (or
    ``<directory>/<name>`` — e.g. the reference's metric-named best
    checkpoints ``base_dice_epoch.pth`` / ``base_aji_epoch.pth``,
    ``train_2d.py:173-179``). Returns the path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, name or f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       template: Optional[Dict[str, Any]] = None,
                       name: Optional[str] = None) -> Dict[str, Any]:
    """Restore ``<directory>/step_<n>`` (latest when ``step`` is None) or a
    metric-named checkpoint ``<directory>/<name>``.
    ``template`` (a matching pytree of arrays) restores with exact
    shapes/dtypes; without it orbax restores as saved."""
    import orbax.checkpoint as ocp

    if name is not None:
        path = os.path.abspath(os.path.join(directory, name))
        if not os.path.isdir(path):
            raise FileNotFoundError(f"no checkpoint named {name} under {directory}")
        ckptr = ocp.StandardCheckpointer()
        if template is not None:
            target = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
                template)
            return ckptr.restore(path, target)
        return ckptr.restore(path)
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        target = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), template)
        return ckptr.restore(path, target)
    return ckptr.restore(path)


def load_params(path: str, cfg) -> Dict:
    """Load SAM2 params from either a torch ``.pt`` checkpoint or an orbax
    directory (auto-detected)."""
    if os.path.isdir(path):
        state = restore_checkpoint(path) if latest_step(path) is not None else None
        if state is None:
            import orbax.checkpoint as ocp

            state = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        return state["params"] if "params" in state else state
    from medsam2_tpu.checkpoint.convert import load_torch_checkpoint

    return load_torch_checkpoint(path, cfg)

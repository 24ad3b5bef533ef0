"""Device mesh + sharding rules (the TPU-native 'distributed backend').

The reference's distributed layer is vestigial torch.distributed/NCCL helpers
that no entry point calls (SURVEY.md §2.6). Here parallelism is expressed the
XLA way: a ``Mesh`` with a ``data`` axis (volumes/images) and a ``model`` axis
(Megatron-style sharding of the wide MLP projections — up-projection sharded on
the output dim, down-projection on the input dim, so XLA inserts a single
psum per MLP), with collectives riding ICI.

``jax.distributed.initialize`` + a DCN axis would extend this to multi-slice;
single-slice meshes need neither.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host bring-up (``jax.distributed.initialize``): call once per host
    before building meshes. No-op on single-process runs. Returns the process
    count. A multi-slice mesh adds a leading DCN axis on top of
    :func:`make_mesh`'s ICI axes."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    return jax.process_count()


def process_local_batch(global_batch: int) -> int:
    """Per-host batch size for per-host data loading (each host feeds its own
    shard of the ``data`` axis)."""
    assert global_batch % jax.process_count() == 0, (
        f"global batch {global_batch} not divisible by {jax.process_count()} hosts")
    return global_batch // jax.process_count()


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1,
              devices=None) -> Mesh:
    """Mesh over (data, model). ``model_axis`` divides the device count."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_axis == 0, f"{n} devices not divisible by model={model_axis}"
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


# Param-path fragments whose linear weights get tensor-parallel sharding.
# (path-end, axis-to-shard): up-projections shard the output dim, the matching
# down-projections shard the input dim.
_UP_KEYS = ("linear1", "pwconv1")
_DOWN_KEYS = ("linear2", "pwconv2")


def _path_names(path):
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return names


def param_sharding(params, mesh: Mesh):
    """NamedShardings for the param pytree: TP-shard the wide FFN projections
    (memory attention linear1/2, ConvNeXt pwconv1/2, two-layer MLPs), replicate
    everything else."""

    def spec_for(path, leaf):
        names = _path_names(path)
        joined = "/".join(names)
        if leaf.ndim == 2:
            # plain MLPs ({"layers": [l0, l1]}) in blocks: shard hidden dim
            is_mlp_layer = "mlp" in joined and "layers" in joined
            if any(k in names for k in _UP_KEYS) and names[-1] == "w":
                return P(None, "model")
            if any(k in names for k in _DOWN_KEYS) and names[-1] == "w":
                return P("model", None)
            if is_mlp_layer and names[-1] == "w":
                # two-layer MLP: layers/0 up, layers/1 down (only when the
                # hidden dim divides the model axis; checked below)
                try:
                    li = int(names[names.index("layers") + 1])
                except (ValueError, IndexError):
                    li = None
                if li == 0 and leaf.shape[1] % mesh.shape["model"] == 0:
                    return P(None, "model")
                if li == 1 and leaf.shape[0] % mesh.shape["model"] == 0:
                    return P("model", None)
        if leaf.ndim == 1:
            if any(k in names for k in _UP_KEYS) and names[-1] == "b":
                return P("model")
        return P()

    def to_sharding(path, leaf):
        spec = spec_for(path, leaf)
        # drop specs that don't divide evenly
        dims = [d for d in spec if d is not None]
        for axis_dim, name in zip(leaf.shape, spec):
            if name is not None and axis_dim % mesh.shape[name] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def batch_sharding(mesh: Mesh):
    """Leading-axis data sharding for batch pytrees."""
    def f(leaf):
        return NamedSharding(mesh, P("data", *([None] * (np.ndim(leaf) - 1))))
    return f


def shard_params(params, mesh: Mesh):
    shardings = param_sharding(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(batch, mesh: Mesh):
    f = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, f(x)), batch)


def replicated(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)

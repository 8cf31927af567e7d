"""Device mesh + sharding rules.

The reference's entire parallelism story is Lightning DDP over NCCL
(train.py:137-149). TPU-native replacement: one jit-compiled train step over
a `jax.sharding.Mesh` — batch sharded along the ``data`` axis, params
replicated (with a ``model`` axis held in reserve for tensor-parallel
layouts), gradient reduction emitted by XLA as ICI all-reduces.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: int = -1, num_model: int = 1,
              devices=None) -> Mesh:
    """Mesh with ("data", "model") axes. num_data=-1 uses all devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data == -1:
        num_data = n // num_model
    assert num_data * num_model <= n, (
        f"requested {num_data}x{num_model} mesh from {n} devices")
    grid = np.asarray(devices[: num_data * num_model]).reshape(
        num_data, num_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place every array in a host batch dict on the mesh, sharded on axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)


def pad_batch_to_devices(batch: dict, mesh: Mesh) -> dict:
    """Right-pad the batch dim so it divides the data-axis size."""
    n = mesh.shape["data"]

    def pad(x):
        b = x.shape[0]
        rem = (-b) % n
        if rem == 0:
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width)

    return {k: pad(v) if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0
            else v for k, v in batch.items()}

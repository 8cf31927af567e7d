"""Parameter partition rules (tensor-parallel layouts).

The MLD models are small enough that pure data-parallel is the production
layout (matching the reference's DDP-only story, train.py:137-149), but the
param tree carries a "model" mesh axis so wide layers CAN be sharded: FFN and
packed-QKV kernels split on their wide dimension, output projections on their
input dimension. XLA's sharding propagation then inserts the ICI collectives.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(path_names, leaf) -> P:
    """PartitionSpec for one param, keyed on its name path."""
    names = [str(p) for p in path_names]
    last = names[-1]
    if getattr(leaf, "ndim", 0) < 2:
        return P()
    # FFN up-projection and packed QKV: shard the wide output dim
    if last == "kernel" and any(n in ("linear1", "fc1") for n in names):
        return P(None, "model")
    if last == "in_proj_kernel":
        return P(None, "model")
    # FFN down-projection / attention output: shard the input dim
    if last == "kernel" and any(n in ("linear2", "fc2", "out_proj")
                                for n in names):
        return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh according to param_spec."""
    def place(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", p)) for p in path]
        spec = param_spec(names, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)

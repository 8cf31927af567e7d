"""Multi-device tests on the 8-device virtual CPU mesh: DP/TP train step,
sharding consistency, and the driver's dryrun entry."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mld_tpu  # noqa: F401
from mld_tpu.parallel.mesh import (
    make_mesh,
    replicate_tree,
    shard_batch,
)
from mld_tpu.parallel.partition import shard_params


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(num_data=4, num_model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dp_loss_matches_single_device():
    """The sharded diffusion train step must produce the same loss/params as
    an unsharded run (same rng, same batch)."""
    from __graft_entry__ import _flagship
    from mld_tpu.train.steps import create_train_state, make_train_step

    cfg, mld, params = _flagship(tiny=True)
    B, T = 8, cfg.dataset.max_motion_len
    rng = np.random.RandomState(0)
    batch = {
        "motion": rng.randn(B, T, cfg.dataset.nfeats).astype(np.float32),
        "mask": np.ones((B, T), bool),
        "text_ids": np.asarray(mld.tokenizer(["walk"] * B), np.int32),
    }
    key = jax.random.PRNGKey(42)

    # single device
    state1 = create_train_state(mld, params, "diffusion")
    step1 = make_train_step(mld, "diffusion", donate=False)
    state1, logs1 = step1(state1, {k: jnp.asarray(v) for k, v in
                                   batch.items()}, key)

    # 4x2 mesh
    mesh = make_mesh(num_data=4, num_model=2)
    with mesh:
        state2 = create_train_state(mld, params, "diffusion")
        state2 = state2.replace(params=shard_params(state2.params, mesh),
                                frozen=replicate_tree(state2.frozen, mesh))
        sharded = shard_batch(batch, mesh)
        state2, logs2 = step1(state2, sharded, key)

    np.testing.assert_allclose(float(logs1["total"]), float(logs2["total"]),
                               rtol=2e-4)
    # parameters after one step agree
    p1 = jax.tree_util.tree_leaves(state1.params)
    p2 = jax.tree_util.tree_leaves(jax.device_get(state2.params))
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

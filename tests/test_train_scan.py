"""make_train_scan: K fused optimizer steps == K single steps, exactly.

Also covers device_prefetch group mode (super-batch stacking + epoch-tail
singles)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mld_tpu  # noqa: F401
from mld_tpu.config import load_config
from mld_tpu.data.datamodule import get_datamodule
from mld_tpu.data.synthetic import build_synthetic_dataset
from mld_tpu.models.mld import MLD
from mld_tpu.train.loop import device_prefetch
from mld_tpu.train.steps import (create_train_state, make_train_scan,
                                 make_train_step)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scan_data"))
    build_synthetic_dataset(root, n_samples=48, seed=7)
    cfg = load_config(None, {
        "debug": True,
        "dataset": {"root": root},
        "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                  "denoiser_num_layers": 3, "num_heads": 4,
                  "text_encoded_dim": 32, "clip_layers": 2,
                  "clip_heads": 2},
        "train": {"stage": "vae", "batch_size": 4},
    }, preset="mld_humanml3d")
    mld = MLD(cfg)
    dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
    mld.mean = jnp.asarray(dm.mean, jnp.float32)
    mld.std = jnp.asarray(dm.std, jnp.float32)
    params = mld.init_params(jax.random.PRNGKey(0))
    return cfg, mld, dm, params


def test_scan_matches_single_steps(tiny):
    cfg, mld, dm, params = tiny
    K = 3
    loader = dm.loader("train", shuffle=False, drop_last=True)
    items = list(device_prefetch(loader, group=K))
    kinds = [k for k, _ in items]
    assert "scan" in kinds
    scan_batch = next(b for k, b in items if k == "scan")
    assert scan_batch["motion"].shape[0] == K

    rng = jax.random.PRNGKey(5)
    state_a = create_train_state(mld, params, "vae")
    scan = make_train_scan(mld, "vae", donate=False)
    state_a, logs = scan(state_a, scan_batch, rng)
    assert logs["total"].shape == (K,)

    state_b = create_train_state(mld, params, "vae")
    step = make_train_step(mld, "vae", donate=False)
    rngs = jax.random.split(rng, K)
    for i in range(K):
        one = {k: v[i] for k, v in scan_batch.items()}
        state_b, logs_b = step(state_b, one, rngs[i])

    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(pa, pb):
        # scan vs unrolled changes XLA fusion boundaries: float-noise
        # only — but Adam amplifies it up to ~lr scale on leaves whose
        # gradient is near zero (m/sqrt(v) of noise is O(1)), so the
        # bound is absolute at a fraction of lr, not relative
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)
    np.testing.assert_allclose(float(logs["total"][-1]),
                               float(logs_b["total"]), rtol=1e-5)


def test_group_prefetch_tail_singles(tiny):
    cfg, mld, dm, params = tiny
    loader = dm.loader("train", shuffle=False, drop_last=True)
    n_batches = sum(1 for _ in loader)
    K = 5
    items = list(device_prefetch(loader, group=K))
    scans = [b for k, b in items if k == "scan"]
    singles = [b for k, b in items if k == "step"]
    assert len(scans) == n_batches // K
    assert len(singles) == n_batches % K
    total = sum(b["motion"].shape[0] for b in scans) + len(singles)
    assert total == n_batches

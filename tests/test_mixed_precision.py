"""Mixed-precision training (cfg.model.dtype == "bfloat16"): forwards run
in bf16, master params / optimizer / loss math stay f32.

Checks, per stage: the bf16 step produces a finite loss close to the f32
step's (bf16-grade tolerance), params actually move, and every param /
optimizer-state leaf stays f32 (no silent dtype bleed into the masters)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mld_tpu  # noqa: F401
from mld_tpu.config import load_config
from mld_tpu.models.mld import MLD
from mld_tpu.train.steps import create_train_state, make_train_step

TINY = {
    "debug": True,
    "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
              "denoiser_num_layers": 3, "num_heads": 4,
              "text_encoded_dim": 32, "clip_layers": 2, "clip_heads": 2},
    "train": {"batch_size": 4},
}


def _build(dtype):
    over = {k: dict(v) for k, v in TINY.items() if isinstance(v, dict)}
    over["debug"] = True
    over["model"]["dtype"] = dtype
    cfg = load_config(None, over, preset="mld_humanml3d")
    mld = MLD(cfg)
    mld.mean = jnp.zeros((cfg.dataset.nfeats,), jnp.float32)
    mld.std = jnp.ones((cfg.dataset.nfeats,), jnp.float32)
    params = mld.init_params(jax.random.PRNGKey(0))
    return cfg, mld, params


def _batch(cfg, mld):
    B, T = 4, cfg.dataset.max_motion_len
    r = np.random.RandomState(0)
    return {
        "motion": jnp.asarray(r.randn(B, T, cfg.dataset.nfeats),
                              jnp.float32),
        "mask": jnp.asarray(np.arange(T)[None] < np.array([[40], [60],
                                                           [T], [24]])),
        "text_ids": jnp.asarray(mld.tokenizer(["a person walks"] * B)),
    }


@pytest.mark.parametrize("stage", ["vae", "diffusion"])
def test_bf16_step_close_to_f32_and_masters_stay_f32(stage):
    losses, states = {}, {}
    for dtype in ("float32", "bfloat16"):
        cfg, mld, params = _build(dtype)
        batch = _batch(cfg, mld)
        state = create_train_state(mld, params, stage)
        step = make_train_step(mld, stage, donate=False)
        new_state, logs = step(state, batch, jax.random.PRNGKey(3))
        losses[dtype] = float(logs["total"])
        states[dtype] = (state, new_state)

    assert np.isfinite(losses["bfloat16"])
    # same init + same rng streams: bf16 forward noise only
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=5e-2)

    old, new = states["bfloat16"]
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(old.params),
                        jax.tree_util.tree_leaves(new.params)))
    assert moved, "bf16 step did not update params"
    for leaf in jax.tree_util.tree_leaves(new.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(new.opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            assert leaf.dtype == jnp.float32

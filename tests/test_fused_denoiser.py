"""Fused serving-path denoiser forward vs the flax module (same params)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mld_tpu  # noqa: F401
from mld_tpu.models.denoiser import MldDenoiser
from mld_tpu.ops.fused_denoiser import can_fuse, fused_denoiser_forward


class TestFusedDenoiser:
    @pytest.mark.parametrize("D,TD,layers", [(256, 768, 9), (64, 48, 3)])
    def test_text_latent(self, D, TD, layers):
        den = MldDenoiser(nfeats=263, condition="text", latent_size=1,
                          latent_dim=D, ff_size=4 * D, num_layers=layers,
                          num_heads=4, dropout=0.1, arch="trans_enc",
                          skip_connect=True, text_encoded_dim=TD)
        B = 8
        sample = jax.random.normal(jax.random.PRNGKey(1), (B, 1, D))
        cond = jax.random.normal(jax.random.PRNGKey(2), (B, 1, TD))
        params = den.init({"params": jax.random.PRNGKey(0)}, sample,
                          jnp.asarray(0), cond)["params"]
        assert can_fuse(den, 1, 1)

        ref = den.apply({"params": params}, sample, jnp.asarray(981), cond)
        out = fused_denoiser_forward(
            params, sample, jnp.asarray(981), cond, num_heads=4,
            num_layers=layers, latent_dim=D, text_encoded_dim=TD,
            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    def test_action_latent(self):
        D = 64
        den = MldDenoiser(nfeats=150, condition="action", latent_size=1,
                          latent_dim=D, ff_size=128, num_layers=3,
                          num_heads=4, dropout=0.1, arch="trans_enc",
                          skip_connect=True, nclasses=12,
                          guidance_scale=7.5)
        B = 4  # CFG-doubled batch: first half uncond
        sample = jax.random.normal(jax.random.PRNGKey(1), (2 * B, 1, D))
        actions = jnp.concatenate([jnp.zeros(B, jnp.int32),
                                   jnp.arange(B, dtype=jnp.int32)])
        params = den.init({"params": jax.random.PRNGKey(0)}, sample,
                          jnp.asarray(0), actions)["params"]

        ref = den.apply({"params": params}, sample, jnp.asarray(10), actions)
        out = fused_denoiser_forward(
            params, sample, jnp.asarray(10), actions, num_heads=4,
            num_layers=3, latent_dim=D, text_encoded_dim=768,
            condition="action", interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    def test_can_fuse_gates(self):
        dec = MldDenoiser(nfeats=263, condition="text", latent_dim=64,
                          arch="trans_dec", num_layers=3)
        assert not can_fuse(dec, 1, 1)
        novae = MldDenoiser(nfeats=263, condition="text", latent_dim=64,
                            arch="trans_enc", num_layers=3,
                            diffusion_only=True)
        assert not can_fuse(novae, 196, 1)

"""Fused serving-path denoiser forward vs the flax module (same params)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mld_tpu  # noqa: F401
from mld_tpu.models.denoiser import MldDenoiser
from mld_tpu.ops.fused_denoiser import (can_fuse, fused_denoiser_forward,
                                        precompute_cond)


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

    @pytest.mark.parametrize("condition", ["text", "action"])
    def test_precomputed_preamble_exact(self, condition):
        """Hoisted time-emb table + projected cond tokens (precompute_cond,
        used by MLD.diffusion_reverse to pull step-invariant work out of the
        50-step scan) must reproduce the inline preamble bit-for-bit."""
        D, layers = 64, 3
        if condition == "text":
            TD = 48
            den = MldDenoiser(nfeats=263, condition="text", latent_size=1,
                              latent_dim=D, ff_size=4 * D, num_layers=layers,
                              num_heads=4, arch="trans_enc",
                              skip_connect=True, text_encoded_dim=TD)
            B = 8
            cond = jax.random.normal(jax.random.PRNGKey(2), (B, 1, TD))
        else:
            TD = 768
            den = MldDenoiser(nfeats=150, condition="action", latent_size=1,
                              latent_dim=D, ff_size=128, num_layers=layers,
                              num_heads=4, arch="trans_enc",
                              skip_connect=True, nclasses=12,
                              guidance_scale=7.5)
            B = 8  # CFG-doubled: first half uncond
            cond = jnp.concatenate([jnp.zeros(B // 2, jnp.int32),
                                    jnp.arange(B // 2, dtype=jnp.int32)])
        sample = jax.random.normal(jax.random.PRNGKey(1), (B, 1, D))
        params = den.init({"params": jax.random.PRNGKey(0)}, sample,
                          jnp.asarray(0), cond)["params"]

        timesteps = jnp.asarray([981, 761, 41])
        time_tab, cond_lat = precompute_cond(
            params, timesteps, cond, latent_dim=D, text_encoded_dim=TD,
            condition=condition)
        assert time_tab.shape == (3, D)
        for i, t in enumerate(timesteps):
            inline = fused_denoiser_forward(
                params, sample, t, cond, num_heads=4, num_layers=layers,
                latent_dim=D, text_encoded_dim=TD, condition=condition,
                interpret=True)
            hoisted = fused_denoiser_forward(
                params, sample, t, cond, num_heads=4, num_layers=layers,
                latent_dim=D, text_encoded_dim=TD, condition=condition,
                interpret=True, time_emb=time_tab[i], cond_lat=cond_lat)
            np.testing.assert_allclose(np.asarray(hoisted),
                                       np.asarray(inline),
                                       atol=1e-6, rtol=1e-6)

    def test_can_fuse_gates(self):
        dec = MldDenoiser(nfeats=263, condition="text", latent_dim=64,
                          arch="trans_dec", num_layers=3)
        assert not can_fuse(dec, 1, 1)
        novae = MldDenoiser(nfeats=263, condition="text", latent_dim=64,
                            arch="trans_enc", num_layers=3,
                            diffusion_only=True)
        assert not can_fuse(novae, 196, 1)

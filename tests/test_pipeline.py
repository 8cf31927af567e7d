"""End-to-end pipeline smoke tests: config presets, jitted sampler, schedulers."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mld_tpu  # noqa: F401
from mld_tpu.config import load_config
from mld_tpu.diffusion.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DiffusionSchedule,
)
from mld_tpu.models.mld import MLD, lengths_to_mask


def tiny_config(preset="mld_humanml3d", **model_over):
    over = {"model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                      "denoiser_num_layers": 3, "num_heads": 4,
                      "text_encoded_dim": 32, "clip_layers": 2,
                      "clip_heads": 2,
                      "scheduler": {"num_inference_timesteps": 5}},
            "dataset": {"max_motion_len": 24}}
    over["model"].update(model_over)
    return load_config(preset=preset, overrides=over)


class TestSchedulers:
    def test_ddim_timesteps_match_diffusers_formula(self):
        sch = DiffusionSchedule.create()
        ddim = DDIMScheduler(sch, 50)
        ts = ddim.timesteps()
        assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50
        assert np.all(np.diff(ts) == -20)

    def test_ddim_exact_eps_recovers_trajectory(self):
        """With the oracle eps, one step maps q(x_t|x0) to q(x_prev|x0)."""
        sch = DiffusionSchedule.create()
        ddim = DDIMScheduler(sch, 50)
        rng = np.random.RandomState(0)
        x0 = rng.randn(4, 1, 8).astype(np.float32)
        eps = rng.randn(4, 1, 8).astype(np.float32)
        for t in [981, 501, 21, 1]:
            ac_t = np.asarray(sch.alphas_cumprod)[t]
            prev = t - 20
            ac_p = (np.asarray(sch.alphas_cumprod)[prev] if prev >= 0
                    else np.asarray(sch.alphas_cumprod)[0])
            x_t = np.sqrt(ac_t) * x0 + np.sqrt(1 - ac_t) * eps
            out = ddim.step(jnp.asarray(eps), jnp.asarray(t),
                            jnp.asarray(x_t))
            expect = np.sqrt(ac_p) * x0 + np.sqrt(1 - ac_p) * eps
            np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_ddpm_add_noise_roundtrip(self):
        sch = DiffusionSchedule.create()
        ddpm = DDPMScheduler(sch)
        rng = np.random.RandomState(1)
        x0 = rng.randn(3, 2, 5).astype(np.float32)
        noise = rng.randn(3, 2, 5).astype(np.float32)
        t = jnp.asarray([999, 500, 0])
        xt = ddpm.add_noise(jnp.asarray(x0), jnp.asarray(noise), t)
        ac = np.asarray(sch.alphas_cumprod)[np.asarray(t)][:, None, None]
        np.testing.assert_allclose(
            np.asarray(xt), np.sqrt(ac) * x0 + np.sqrt(1 - ac) * noise,
            atol=1e-6)

    def test_ddpm_step_t0_returns_x0_mean(self):
        sch = DiffusionSchedule.create()
        ddpm = DDPMScheduler(sch)
        rng = np.random.RandomState(2)
        x0 = rng.randn(2, 1, 4).astype(np.float32)
        eps = rng.randn(2, 1, 4).astype(np.float32)
        ac0 = np.asarray(sch.alphas_cumprod)[0]
        x_t = np.sqrt(ac0) * x0 + np.sqrt(1 - ac0) * eps
        out = ddpm.step(jnp.asarray(eps), jnp.asarray(0), jnp.asarray(x_t),
                        jnp.zeros_like(jnp.asarray(x_t)))
        np.testing.assert_allclose(np.asarray(out), x0, atol=1e-4)


class TestEndToEnd:
    def test_text_to_motion_shapes(self):
        cfg = tiny_config()
        mld = MLD(cfg)
        params = mld.init_params(jax.random.PRNGKey(0))
        lengths = [24, 10]
        out = mld.generate(params, ["walk forward", "jump"], lengths,
                           jax.random.PRNGKey(1))
        assert len(out) == 2
        assert out[0].shape == (24, 22, 3)
        assert out[1].shape == (10, 22, 3)
        assert np.isfinite(out[0]).all()

    def test_generate_deterministic_given_rng(self):
        cfg = tiny_config()
        mld = MLD(cfg)
        params = mld.init_params(jax.random.PRNGKey(0))
        mask = lengths_to_mask(jnp.asarray([16]), cfg.dataset.max_motion_len)
        ids = jnp.asarray(mld.tokenizer(["spin in place"]))
        a = mld.generate_feats(params, ids, mask, jax.random.PRNGKey(7))
        b = mld.generate_feats(params, ids, mask, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # padded frames are zeroed
        assert np.all(np.asarray(a)[0, 16:] == 0)

    def test_novae_pipeline(self):
        cfg = tiny_config(preset="novae_humanml3d")
        # keep tiny inference budget
        assert cfg.model.scheduler.num_inference_timesteps == 5
        mld = MLD(cfg)
        params = mld.init_params(jax.random.PRNGKey(0))
        mask = lengths_to_mask(jnp.asarray([20, 24]),
                               cfg.dataset.max_motion_len)
        ids = jnp.asarray(mld.tokenizer(["run", "sit"]))
        feats = mld.generate_feats(params, ids, mask, jax.random.PRNGKey(3))
        assert feats.shape == (2, 24, 263)
        assert np.all(np.asarray(feats)[0, 20:] == 0)

    def test_vae_roundtrip_shapes(self):
        cfg = tiny_config(preset="vae_humanml3d")
        mld = MLD(cfg)
        params = mld.init_params(jax.random.PRNGKey(0))
        B, T = 2, cfg.dataset.max_motion_len
        feats = jnp.asarray(
            np.random.RandomState(0).randn(B, T, 263), jnp.float32)
        mask = lengths_to_mask(jnp.asarray([T, 12]), T)
        z, (mu, logvar) = mld.encode_motion(params, feats, mask,
                                            jax.random.PRNGKey(1))
        assert z.shape == (B, 1, 32)
        rec = mld.decode_latent(params, z, mask)
        assert rec.shape == (B, T, 263)
        assert np.all(np.asarray(rec)[1, 12:] == 0)

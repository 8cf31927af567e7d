"""Additional parity coverage: loss formulas vs torch, sinusoidal PE vs the
reference buffer, VPosert wiring, MLP_DIST variant."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

import mld_tpu  # noqa: F401
from mld_tpu.losses.mld import kl_standard_normal, mse, smooth_l1


class TestLossFormulas:
    def test_smooth_l1_vs_torch(self):
        import torch
        rng = np.random.RandomState(0)
        a = rng.randn(64, 7).astype(np.float32) * 3
        b = rng.randn(64, 7).astype(np.float32)
        ours = float(smooth_l1(jnp.asarray(a), jnp.asarray(b)))
        theirs = float(torch.nn.SmoothL1Loss(reduction="mean")(
            torch.tensor(a), torch.tensor(b)))
        assert ours == pytest.approx(theirs, rel=1e-6)

    def test_kl_vs_torch_distributions(self):
        import torch
        rng = np.random.RandomState(1)
        mu = rng.randn(8, 1, 16).astype(np.float32)
        logvar = rng.randn(8, 1, 16).astype(np.float32)
        ours = float(kl_standard_normal(jnp.asarray(mu),
                                        jnp.asarray(logvar)))
        q = torch.distributions.Normal(
            torch.tensor(mu), torch.tensor(np.exp(0.5 * logvar)))
        p = torch.distributions.Normal(torch.zeros_like(q.loc),
                                       torch.ones_like(q.scale))
        theirs = float(torch.distributions.kl_divergence(q, p).mean())
        assert ours == pytest.approx(theirs, rel=1e-5)

    def test_mse_vs_torch(self):
        import torch
        rng = np.random.RandomState(2)
        a = rng.randn(10, 3).astype(np.float32)
        b = rng.randn(10, 3).astype(np.float32)
        assert float(mse(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
            float(torch.nn.MSELoss()(torch.tensor(a), torch.tensor(b))),
            rel=1e-6)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
class TestSinePE:
    def test_actor_pe_matches_reference_buffer(self):
        add_reference_to_path()
        import torch
        from mld.models.operator.position_encoding_layer import (
            PositionalEncoding as RefPE)
        from mld_tpu.ops.embeddings import PositionEmbeddingSine1D

        D = 32
        ref = RefPE(D, dropout=0.0)
        x = np.random.RandomState(0).randn(2, 11, D).astype(np.float32)
        with torch.no_grad():
            out_t = ref(torch.tensor(x).permute(1, 0, 2)).permute(
                1, 0, 2).numpy()
        pe = PositionEmbeddingSine1D(D, max_len=5000, dropout=0.0)
        out_j = pe.apply({}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=1e-5)


class TestVariantWiring:
    def test_vposert_pipeline(self, tmp_path):
        from mld_tpu.config import load_config
        from mld_tpu.models.mld import MLD, lengths_to_mask

        cfg = load_config(None, {
            "debug": True,
            "model": {"vae_type": "vposert", "latent_dim": 32,
                      "ff_size": 64, "num_layers": 3,
                      "denoiser_num_layers": 3, "num_heads": 4,
                      "text_encoded_dim": 32, "clip_layers": 2,
                      "clip_heads": 2,
                      "scheduler": {"num_inference_timesteps": 2}},
            "dataset": {"root": str(tmp_path), "max_motion_len": 32,
                        "min_motion_len": 16},
        }, preset="mld_humanml3d")
        mld = MLD(cfg)
        params = mld.init_params(jax.random.PRNGKey(0))
        mask = lengths_to_mask(jnp.asarray([32, 20]), 32)
        ids = jnp.asarray(mld.tokenizer(["walk", "run"]))
        feats = mld.generate_feats(params, ids, mask, jax.random.PRNGKey(1))
        assert feats.shape == (2, 32, 263)
        assert np.isfinite(np.asarray(feats)).all()

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_mlp_dist_parity(self):
        add_reference_to_path()
        import types
        import torch
        from mld.models.architectures.mld_vae import MldVae as RefVae
        from mld_tpu.models.vae import MldVae
        from mld_tpu.utils.torch_convert import torch_state_dict_to_flax

        torch.manual_seed(0)
        abl = types.SimpleNamespace(MLP_DIST=True, PE_TYPE="mld")
        NF, D = 16, 32
        ref = RefVae(abl, nfeats=NF, latent_dim=[1, D], ff_size=64,
                     num_layers=3, num_heads=4, dropout=0.0,
                     arch="encoder_decoder", activation="gelu",
                     position_embedding="learned").eval()
        ours = MldVae(nfeats=NF, latent_size=1, latent_dim=D, ff_size=64,
                      num_layers=3, num_heads=4, dropout=0.0,
                      mlp_dist=True)
        params = torch_state_dict_to_flax(ref.state_dict())

        B, T = 2, 9
        lengths = [9, 5]
        feats = np.random.RandomState(0).randn(B, T, NF).astype(np.float32)
        mask = np.arange(T)[None] < np.asarray(lengths)[:, None]
        feats = feats * mask[..., None]
        with torch.no_grad():
            _, dist = ref.encode(torch.tensor(feats), lengths)
            mu_t = dist.loc.permute(1, 0, 2).numpy()
        _, (mu_j, _) = ours.apply({"params": params}, jnp.asarray(feats),
                                  jnp.asarray(mask), method=ours.encode,
                                  sample_mean=True)
        np.testing.assert_allclose(np.asarray(mu_j), mu_t, atol=2e-4)

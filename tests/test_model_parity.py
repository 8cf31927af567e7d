"""End-to-end module parity: MldVae / MldDenoiser vs the reference torch
implementations with converted weights (the released-checkpoint path)."""
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

import mld_tpu  # noqa: F401
from mld_tpu.models.denoiser import MldDenoiser
from mld_tpu.models.vae import MldVae
from mld_tpu.utils.torch_convert import torch_state_dict_to_flax

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference not mounted")

NFEATS, D, H, FF, LAYERS = 32, 64, 4, 128, 3


def make_ablation():
    return types.SimpleNamespace(
        MLP_DIST=False, PE_TYPE="mld", DIFF_PE_TYPE="mld",
        SKIP_CONNECT=True, VAE_TYPE="mld", PREDICT_EPSILON=True)


def lengths_to_mask_np(lengths, max_len):
    return (np.arange(max_len)[None] < np.asarray(lengths)[:, None])


@pytest.fixture(scope="module")
def torch_setup():
    add_reference_to_path()
    import torch
    torch.manual_seed(0)
    return torch


class TestVaeParity:
    @pytest.mark.parametrize("arch", ["encoder_decoder", "all_encoder"])
    def test_encode_decode(self, torch_setup, arch):
        torch = torch_setup
        from mld.models.architectures.mld_vae import MldVae as RefVae

        ref = RefVae(make_ablation(), nfeats=NFEATS, latent_dim=[1, D],
                     ff_size=FF, num_layers=LAYERS, num_heads=H, dropout=0.0,
                     arch=arch, normalize_before=False, activation="gelu",
                     position_embedding="learned")
        ref.eval()

        ours = MldVae(nfeats=NFEATS, latent_size=1, latent_dim=D, ff_size=FF,
                      num_layers=LAYERS, num_heads=H, dropout=0.0, arch=arch)
        params = torch_state_dict_to_flax(ref.state_dict())

        B, T = 3, 17
        lengths = [17, 11, 5]
        feats = np.random.RandomState(1).randn(B, T, NFEATS).astype(np.float32)
        mask = lengths_to_mask_np(lengths, T)
        # zero padded region as the data pipeline guarantees
        feats = feats * mask[..., None]

        with torch.no_grad():
            mu_ref_latent, dist = ref.encode(torch.tensor(feats), lengths)
            mu_t = dist.loc.permute(1, 0, 2).numpy()      # [B, 1, D]
            scale_t = dist.scale.permute(1, 0, 2).numpy()
            z = dist.loc  # deterministic: decode from the mean
            feats_rst_t = ref.decode(z, lengths).numpy()

        (z_j, (mu_j, logvar_j)) = ours.apply(
            {"params": params}, jnp.asarray(feats), jnp.asarray(mask),
            method=ours.encode, sample_mean=True)
        np.testing.assert_allclose(np.asarray(mu_j), mu_t, atol=1e-4)
        np.testing.assert_allclose(np.exp(0.5 * np.asarray(logvar_j)),
                                   scale_t, atol=1e-4)

        feats_rst_j = ours.apply({"params": params}, jnp.asarray(mu_j),
                                 jnp.asarray(mask), method=ours.decode)
        np.testing.assert_allclose(np.asarray(feats_rst_j), feats_rst_t,
                                   atol=2e-4)


class TestDenoiserParity:
    def test_text_latent_mode(self, torch_setup):
        torch = torch_setup
        from mld.models.architectures.mld_denoiser import (
            MldDenoiser as RefDenoiser)

        text_dim = 48
        ref = RefDenoiser(make_ablation(), nfeats=NFEATS, condition="text",
                          latent_dim=[1, D], ff_size=FF, num_layers=LAYERS,
                          num_heads=H, dropout=0.0, normalize_before=False,
                          activation="gelu", flip_sin_to_cos=True,
                          position_embedding="learned", arch="trans_enc",
                          freq_shift=0, text_encoded_dim=text_dim)
        ref.eval()

        ours = MldDenoiser(nfeats=NFEATS, condition="text", latent_size=1,
                           latent_dim=D, ff_size=FF, num_layers=LAYERS,
                           num_heads=H, dropout=0.0, arch="trans_enc",
                           skip_connect=True, text_encoded_dim=text_dim)
        state = ref.state_dict()
        params = torch_state_dict_to_flax(state)
        # reference emb_proj is Sequential(ReLU, Linear) -> keys 'emb_proj.1.*'
        # ours applies relu inline and names the Dense 'emb_proj'
        params["emb_proj"] = params.pop("emb_proj_1")

        B = 4
        sample = np.random.RandomState(2).randn(B, 1, D).astype(np.float32)
        text_emb = np.random.RandomState(3).randn(B, 1, text_dim).astype(
            np.float32)
        t = 981

        with torch.no_grad():
            out_t = ref(sample=torch.tensor(sample),
                        timestep=torch.tensor(t),
                        encoder_hidden_states=torch.tensor(text_emb),
                        lengths=None)[0].numpy()

        out_j = ours.apply({"params": params}, jnp.asarray(sample),
                           jnp.asarray(t), jnp.asarray(text_emb))
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-4)

"""Released-checkpoint conversion path: a fabricated lightning-style .ckpt
(reference torch modules, vae.*/denoiser.* prefixes) loads through
load_reference_checkpoint and reproduces the torch forward numerics."""
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

import mld_tpu  # noqa: F401
from mld_tpu.config import load_config
from mld_tpu.models.mld import MLD, lengths_to_mask
from mld_tpu.utils.checkpoint import load_reference_checkpoint

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference not mounted")

NF, D, FF, LAYERS, TEXT_D = 32, 64, 128, 3, 48


def build_reference_ckpt(tmp_path):
    add_reference_to_path()
    import torch
    from mld.models.architectures.mld_denoiser import (
        MldDenoiser as RefDenoiser)
    from mld.models.architectures.mld_vae import MldVae as RefVae

    torch.manual_seed(0)
    abl = types.SimpleNamespace(MLP_DIST=False, PE_TYPE="mld",
                                DIFF_PE_TYPE="mld", SKIP_CONNECT=True,
                                VAE_TYPE="mld", PREDICT_EPSILON=True)
    vae = RefVae(abl, nfeats=NF, latent_dim=[1, D], ff_size=FF,
                 num_layers=LAYERS, num_heads=4, dropout=0.0,
                 arch="encoder_decoder", activation="gelu",
                 position_embedding="learned").eval()
    den = RefDenoiser(abl, nfeats=NF, condition="text", latent_dim=[1, D],
                      ff_size=FF, num_layers=LAYERS, num_heads=4,
                      dropout=0.0, activation="gelu", flip_sin_to_cos=True,
                      position_embedding="learned", arch="trans_enc",
                      freq_shift=0, text_encoded_dim=TEXT_D).eval()
    state = {}
    for prefix, mod in (("vae", vae), ("denoiser", den)):
        for k, v in mod.state_dict().items():
            state[f"{prefix}.{k}"] = v
    path = tmp_path / "released.ckpt"
    torch.save({"state_dict": state, "epoch": 1234}, str(path))
    return str(path), vae, den


def test_released_ckpt_roundtrip(tmp_path):
    import torch
    ckpt_path, ref_vae, ref_den = build_reference_ckpt(tmp_path)

    cfg = load_config(None, {
        "model": {"latent_dim": D, "ff_size": FF, "num_layers": LAYERS,
                  "denoiser_num_layers": LAYERS, "num_heads": 4,
                  "dropout": 0.0, "text_encoded_dim": TEXT_D,
                  "clip_layers": 2, "clip_heads": 2},
        "dataset": {"nfeats": NF, "max_motion_len": 24},
    }, preset="mld_humanml3d")
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    loaded = load_reference_checkpoint(ckpt_path, params)

    # VAE decode parity through the full load path
    B, T = 2, 16
    lengths = [16, 9]
    mask = lengths_to_mask(jnp.asarray(lengths), T)
    z = np.random.RandomState(0).randn(B, 1, D).astype(np.float32)
    with torch.no_grad():
        out_t = ref_vae.decode(torch.tensor(z).permute(1, 0, 2),
                               lengths).numpy()
    out_j = mld.decode_latent(loaded, jnp.asarray(z), mask)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-4)

    # denoiser parity
    sample = np.random.RandomState(1).randn(B, 1, D).astype(np.float32)
    text = np.random.RandomState(2).randn(B, 1, TEXT_D).astype(np.float32)
    with torch.no_grad():
        den_t = ref_den(sample=torch.tensor(sample),
                        timestep=torch.tensor(501),
                        encoder_hidden_states=torch.tensor(text))[0].numpy()
    den_j = mld.denoise(loaded, jnp.asarray(sample), jnp.asarray(501),
                        jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(den_j), den_t, atol=2e-4)

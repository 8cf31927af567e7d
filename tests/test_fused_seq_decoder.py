"""Fused VAE-decoder stack vs the flax modules (same params)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mld_tpu  # noqa: F401
from mld_tpu.models.vae import MldVae
from mld_tpu.ops.fused_seq_decoder import (can_fuse_decode,
                                           fused_skip_decoder,
                                           fused_vae_decode)
from mld_tpu.ops.transformer import SkipTransformerDecoder


@pytest.mark.parametrize("B,S,M,D,H,F,L", [
    (5, 30, 1, 64, 4, 128, 3),
    (4, 26, 2, 64, 2, 96, 5),   # 2 latent tokens, 2 skip levels
])
def test_matches_xla_decoder_stack(B, S, M, D, H, F, L):
    dec = SkipTransformerDecoder(d_model=D, num_heads=H, num_layers=L,
                                 ff_size=F, dropout=0.0)
    tgt = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.float32)
    mem = jax.random.normal(jax.random.PRNGKey(2), (B, M, D), jnp.float32)
    lens = np.array([S, S - 3, 7, S - 1, 12][:B])
    valid = jnp.asarray(np.arange(S)[None] < lens[:, None])
    params = dec.init({"params": jax.random.PRNGKey(0)}, tgt, mem,
                      valid)["params"]

    ref = dec.apply({"params": params}, tgt, mem, valid,
                    deterministic=True)
    h = fused_skip_decoder(tgt, mem, valid, params, L, H, interpret=True,
                           tile_b=2)
    norm = params["norm"]
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    out = (h - mu) / jnp.sqrt(var + 1e-5) * norm["scale"] + norm["bias"]
    # garbage padded-query rows differ; compare valid rows only
    ok = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(out)[ok], np.asarray(ref)[ok],
                               atol=1e-4, rtol=1e-4)


def test_fused_vae_decode_matches_module():
    B, T, nfeats, D, L = 4, 29, 67, 64, 3
    vae = MldVae(nfeats=nfeats, latent_dim=D, latent_size=1,
                 ff_size=128, num_layers=L, num_heads=4, dropout=0.1,
                 arch="encoder_decoder")
    assert can_fuse_decode(vae, 1)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, T, nfeats))
    lens = np.array([T, T - 5, 9, T - 1])
    mask = jnp.asarray(np.arange(T)[None] < lens[:, None])
    params = vae.init({"params": jax.random.PRNGKey(0)}, feats,
                      mask)["params"]
    z = jax.random.normal(jax.random.PRNGKey(3), (B, 1, D))

    ref = vae.apply({"params": params}, z, mask, deterministic=True,
                    method=vae.decode)
    out = fused_vae_decode(params, z, mask, num_layers=L, num_heads=4,
                           nfeats=nfeats, interpret=True, tile_b=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

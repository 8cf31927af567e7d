"""VPosert — MLP sequence VAE over flattened motion (ablation alternative).

Parity target: mld/models/architectures/vposert_vae.py:27-145. Flattens the
full padded clip (196 x 263) and autoencodes with BatchNorm MLPs; the
distribution decoder uses softplus scale (not exp(logvar/2)).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class VPosert(nn.Module):
    nfeats: int = 263
    max_frames: int = 196
    latent_size: int = 1
    latent_dim: int = 256
    num_neurons: int = 512

    def setup(self):
        self.bn_in = nn.BatchNorm(use_running_average=True)
        self.enc_1 = nn.Dense(self.num_neurons)
        self.bn_mid = nn.BatchNorm(use_running_average=True)
        self.enc_2 = nn.Dense(self.num_neurons)
        self.enc_3 = nn.Dense(self.num_neurons)
        self.mu_head = nn.Dense(self.latent_dim)
        self.logvar_head = nn.Dense(self.latent_dim)
        self.dec_1 = nn.Dense(self.num_neurons)
        self.dec_2 = nn.Dense(self.num_neurons)
        self.dec_out = nn.Dense(self.max_frames * self.nfeats)

    def _encode_scale(self, features):
        n_features = self.max_frames * self.nfeats
        x = features.reshape(features.shape[0], n_features)
        x = self.bn_in(x)
        x = nn.leaky_relu(self.enc_1(x), 0.01)
        x = self.bn_mid(x)
        x = self.enc_2(x)
        x = self.enc_3(x)
        return self.mu_head(x), nn.softplus(self.logvar_head(x))

    def encode(self, features, mask=None, rng: Optional[jax.Array] = None,
               *, sample_mean: bool = False, fact: float = 1.0,
               deterministic: bool = True):
        mu, scale = self._encode_scale(features)
        mu, scale = mu[:, None, :], scale[:, None, :]
        logvar = 2.0 * jnp.log(scale + 1e-12)
        if sample_mean or rng is None:
            return mu, (mu, logvar)
        eps = jax.random.normal(rng, mu.shape).astype(mu.dtype)
        return mu + fact * eps * scale, (mu, logvar)

    def decode(self, z, mask=None, *, deterministic: bool = True):
        x = nn.leaky_relu(self.dec_1(z[:, 0]), 0.01)
        x = nn.leaky_relu(self.dec_2(x), 0.01)
        feats = self.dec_out(x).reshape(-1, self.max_frames, self.nfeats)
        if mask is not None:
            feats = feats[:, : mask.shape[1]] * mask[..., None]
        return feats

    def __call__(self, features, mask=None, rng=None, *, deterministic=True):
        z, dist = self.encode(features, mask, rng)
        feats = self.decode(z, mask)
        return feats, z, dist

"""ActorVae — ACTOR-style motion VAE (flax), used by the HumanAct12 config.

Parity target: mld/models/architectures/actor_vae.py:11-258 — separate
agnostic encoder (mu/logvar tokens PREPENDED, plain transformer encoder,
sinusoidal PE with dropout) and decoder (latent memory + time queries,
plain transformer decoder). Interface mirrors models/vae.py (batch-first,
masks).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mld_tpu.ops.embeddings import PositionEmbeddingSine1D
from mld_tpu.ops.transformer import TransformerDecoder, TransformerEncoder


class ActorAgnosticEncoder(nn.Module):
    nfeats: int
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, features, mask, *, deterministic: bool = True):
        B = features.shape[0]
        d = self.latent_dim
        x = nn.Dense(d, name="skel_embedding")(features)
        mu_token = self.param("mu_token", nn.initializers.normal(1.0), (d,))
        logvar_token = self.param("logvar_token",
                                  nn.initializers.normal(1.0), (d,))
        tokens = jnp.broadcast_to(
            jnp.stack([mu_token, logvar_token])[None], (B, 2, d))
        xseq = jnp.concatenate([tokens, x], axis=1)
        aug_valid = jnp.concatenate([jnp.ones((B, 2), bool), mask], axis=1)
        xseq = PositionEmbeddingSine1D(
            d, max_len=5000, dropout=self.dropout,
            name="sequence_pos_encoding")(xseq, deterministic=deterministic)
        out = TransformerEncoder(
            d, self.num_heads, self.num_layers, self.ff_size, self.dropout,
            self.activation, name="seqTransEncoder")(
                xseq, aug_valid, deterministic=deterministic)
        return out[:, 0], out[:, 1]  # mu, logvar


class ActorAgnosticDecoder(nn.Module):
    nfeats: int
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, z, mask, *, deterministic: bool = True):
        B, T = mask.shape
        d = self.latent_dim
        queries = jnp.zeros((B, T, d), z.dtype)
        queries = PositionEmbeddingSine1D(
            d, max_len=5000, dropout=self.dropout,
            name="sequence_pos_encoding")(queries,
                                          deterministic=deterministic)
        out = TransformerDecoder(
            d, self.num_heads, self.num_layers, self.ff_size, self.dropout,
            self.activation, final_norm=False, name="seqTransDecoder")(
                queries, z, tgt_valid=mask, deterministic=deterministic)
        out = nn.Dense(self.nfeats, name="final_layer")(out)
        return out * mask[..., None]


class ActorVae(nn.Module):
    """Same interface as MldVae (encode/decode/__call__)."""
    nfeats: int
    latent_size: int = 1
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    is_vae: bool = True

    def setup(self):
        self.encoder = ActorAgnosticEncoder(
            self.nfeats, self.latent_dim, self.ff_size, self.num_layers,
            self.num_heads, self.dropout, self.activation)
        self.decoder = ActorAgnosticDecoder(
            self.nfeats, self.latent_dim, self.ff_size, self.num_layers,
            self.num_heads, self.dropout, self.activation)

    def encode_dist(self, features, mask, *, deterministic=True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mu, logvar = self.encoder(features, mask,
                                  deterministic=deterministic)
        return mu[:, None, :], logvar[:, None, :]

    def encode(self, features, mask, rng: Optional[jax.Array] = None, *,
               sample_mean: bool = False, fact: float = 1.0,
               deterministic: bool = True):
        mu, logvar = self.encode_dist(features, mask,
                                      deterministic=deterministic)
        if sample_mean or rng is None or not self.is_vae:
            return mu, (mu, logvar)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, mu.shape).astype(mu.dtype)
        return mu + fact * eps * std, (mu, logvar)

    def decode(self, z, mask, *, deterministic: bool = True):
        return self.decoder(z, mask, deterministic=deterministic)

    def __call__(self, features, mask, rng=None, *, deterministic=True):
        z, dist = self.encode(features, mask, rng,
                              deterministic=deterministic)
        feats = self.decode(z, mask, deterministic=deterministic)
        return feats, z, dist

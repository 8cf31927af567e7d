"""MldVae — transformer motion VAE (flax.linen, batch-first, mask-driven).

Compresses a padded motion batch [B, T<=196, nfeats] into a tiny latent
[B, latent_size, latent_dim] and decodes it back. Variable length is carried
by a boolean frame-validity mask; all shapes are static under jit.

Behavioral parity target: mld/models/architectures/mld_vae.py:33-248
(token ordering: distribution tokens are PREPENDED to the frame sequence in
encode, mld_vae.py:155; decoded frames outside the mask are zeroed,
mld_vae.py:245).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mld_tpu.ops.embeddings import build_position_encoding
from mld_tpu.ops.transformer import (
    SkipTransformerDecoder,
    SkipTransformerEncoder,
)


class MldVae(nn.Module):
    nfeats: int
    latent_size: int = 1
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    arch: str = "encoder_decoder"  # or "all_encoder"
    normalize_before: bool = False
    activation: str = "gelu"
    position_embedding: str = "learned"
    mlp_dist: bool = False  # ABLATION.MLP_DIST: Linear head -> (mu|logvar)
    use_pallas: Optional[bool] = None

    def setup(self):
        d = self.latent_dim
        self.query_pos_encoder = build_position_encoding(
            d, self.position_embedding)
        self.query_pos_decoder = build_position_encoding(
            d, self.position_embedding)
        self.encoder = SkipTransformerEncoder(
            d, self.num_heads, self.num_layers, self.ff_size, self.dropout,
            self.activation, self.normalize_before, self.use_pallas)
        if self.arch == "all_encoder":
            self.decoder = SkipTransformerEncoder(
                d, self.num_heads, self.num_layers, self.ff_size, self.dropout,
                self.activation, self.normalize_before, self.use_pallas)
        elif self.arch == "encoder_decoder":
            self.decoder = SkipTransformerDecoder(
                d, self.num_heads, self.num_layers, self.ff_size, self.dropout,
                self.activation, self.normalize_before, self.use_pallas)
        else:
            raise ValueError(f"arch {self.arch} not supported")
        n_tokens = (self.latent_size if self.mlp_dist
                    else self.latent_size * 2)
        self.global_motion_token = self.param(
            "global_motion_token", nn.initializers.xavier_uniform(),
            (n_tokens, d))
        if self.mlp_dist:
            self.dist_layer = nn.Dense(2 * d)
        self.skel_embedding = nn.Dense(d)
        self.final_layer = nn.Dense(self.nfeats)

    # ------------------------------------------------------------------ encode
    def encode_dist(self, features: jnp.ndarray, mask: jnp.ndarray, *,
                    deterministic: bool = True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """features [B, T, nfeats], mask [B, T] bool -> (mu, logvar)
        each [B, latent_size, latent_dim]."""
        B = features.shape[0]
        x = self.skel_embedding(features)
        dist_tokens = jnp.broadcast_to(
            self.global_motion_token[None],
            (B,) + self.global_motion_token.shape)
        xseq = jnp.concatenate([dist_tokens, x], axis=1)
        aug_valid = jnp.concatenate(
            [jnp.ones((B, dist_tokens.shape[1]), bool), mask], axis=1)

        xseq = self.query_pos_encoder(xseq)
        out = self.encoder(xseq, aug_valid, deterministic=deterministic)
        dist = out[:, : dist_tokens.shape[1]]
        if self.mlp_dist:
            tokens_dist = self.dist_layer(dist)
            mu = tokens_dist[..., : self.latent_dim]
            logvar = tokens_dist[..., self.latent_dim:]
        else:
            mu = dist[:, : self.latent_size]
            logvar = dist[:, self.latent_size:]
        return mu, logvar

    def encode(self, features, mask, rng: Optional[jax.Array] = None, *,
               sample_mean: bool = False, fact: float = 1.0,
               deterministic: bool = True):
        """Returns (z [B, latent_size, latent_dim], (mu, logvar))."""
        mu, logvar = self.encode_dist(features, mask,
                                      deterministic=deterministic)
        if sample_mean or rng is None:
            return mu, (mu, logvar)
        std = jnp.exp(0.5 * logvar)
        # eps drawn in f32 regardless of compute dtype: bf16 normal draws
        # are DIFFERENT numbers (bf16 uniforms), not rounded f32 ones —
        # keeping the stream f32 makes mixed-precision runs replay the
        # same noise as f32 runs (cast is a no-op for f32 models)
        eps = jax.random.normal(rng, mu.shape).astype(mu.dtype)
        z = mu + fact * eps * std
        return z, (mu, logvar)

    # ------------------------------------------------------------------ decode
    def decode(self, z: jnp.ndarray, mask: jnp.ndarray, *,
               deterministic: bool = True) -> jnp.ndarray:
        """z [B, latent_size, latent_dim], mask [B, T] -> feats [B, T, nfeats]."""
        B, T = mask.shape
        queries = jnp.zeros((B, T, self.latent_dim), z.dtype)

        if self.arch == "all_encoder":
            xseq = jnp.concatenate([z, queries], axis=1)
            aug_valid = jnp.concatenate(
                [jnp.ones((B, self.latent_size), bool), mask], axis=1)
            xseq = self.query_pos_decoder(xseq)
            output = self.decoder(xseq, aug_valid,
                                  deterministic=deterministic)[:, self.latent_size:]
        else:
            queries = self.query_pos_decoder(queries)
            output = self.decoder(queries, z, tgt_valid=mask,
                                  deterministic=deterministic)

        feats = self.final_layer(output)
        return feats * mask[..., None]

    def __call__(self, features, mask, rng=None, *, deterministic=True):
        z, dist = self.encode(features, mask, rng, deterministic=deterministic)
        feats = self.decode(z, mask, deterministic=deterministic)
        return feats, z, dist

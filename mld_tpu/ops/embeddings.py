"""Positional and timestep embeddings (flax.linen).

Parity targets:
  learned 1D PE        — mld/models/operator/position_encoding.py:138-159
  sinusoidal PE        — mld/models/operator/position_encoding_layer.py:6-30
  timestep sinusoid    — mld/models/architectures/tools/embeddings.py:245-322
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """Classic sin/cos interleaved table [max_len, d_model]."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class PositionEmbeddingLearned1D(nn.Module):
    """Learned additive PE over the (batch-first) sequence axis."""
    d_model: int
    max_len: int = 500

    @nn.compact
    def __call__(self, x):  # x: [B, S, D]
        pe = self.param("pe", nn.initializers.uniform(scale=1.0),
                        (self.max_len, 1, self.d_model))
        return x + pe[: x.shape[1], 0][None]


class PositionEmbeddingSine1D(nn.Module):
    """Fixed sinusoidal additive PE (the "actor"/sine variant)."""
    d_model: int
    max_len: int = 500
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):  # x: [B, S, D]
        table = jnp.asarray(sinusoidal_table(self.max_len, self.d_model))
        x = x + table[: x.shape[1]][None]
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def build_position_encoding(d_model: int, position_embedding: str = "learned",
                            **kw):
    if position_embedding in ("v3", "learned"):
        return PositionEmbeddingLearned1D(d_model, **kw)
    if position_embedding in ("v2", "sine", "actor"):
        return PositionEmbeddingSine1D(d_model, **kw)
    raise ValueError(f"not supported {position_embedding}")


def get_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int,
                           flip_sin_to_cos: bool = False,
                           downscale_freq_shift: float = 1.0,
                           scale: float = 1.0,
                           max_period: int = 10000) -> jnp.ndarray:
    """DDPM sinusoidal timestep embedding. timesteps: [N] -> [N, dim]."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class Timesteps(nn.Module):
    num_channels: int
    flip_sin_to_cos: bool = True
    downscale_freq_shift: float = 0.0

    def __call__(self, timesteps):
        return get_timestep_embedding(timesteps, self.num_channels,
                                      self.flip_sin_to_cos,
                                      self.downscale_freq_shift)


class TimestepEmbedding(nn.Module):
    """2-layer SiLU MLP over the sinusoid (embeddings.py:288-305)."""
    time_embed_dim: int

    @nn.compact
    def __call__(self, sample):
        sample = nn.Dense(self.time_embed_dim, name="linear_1")(sample)
        sample = nn.silu(sample)
        return nn.Dense(self.time_embed_dim, name="linear_2")(sample)

"""Fused short-sequence transformer layer vs the XLA layer (numerics)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mld_tpu  # noqa: F401
from mld_tpu.ops.fused_layer import fused_encoder_layer, fused_skip_encoder
from mld_tpu.ops.transformer import (SkipTransformerEncoder,
                                     TransformerEncoderLayer)


@pytest.mark.parametrize("S,B,D,H,F", [
    (3, 16, 256, 4, 1024),   # latent denoiser shape (flagship dims)
    (4, 8, 128, 4, 256),
    (2, 32, 64, 2, 128),
])
def test_matches_xla_layer(S, B, D, H, F):
    layer = TransformerEncoderLayer(d_model=D, num_heads=H, ff_size=F,
                                    dropout=0.0, activation="gelu",
                                    normalize_before=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.float32)
    params = layer.init({"params": rng}, x)["params"]

    ref = layer.apply({"params": params}, x, deterministic=True)
    out = fused_encoder_layer(x, params, num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("L,B,D,H,F", [
    (9, 16, 256, 4, 1024),   # flagship denoiser stack
    (3, 8, 64, 2, 128),
])
def test_skip_encoder_matches_xla(L, B, D, H, F):
    S = 3
    stack = SkipTransformerEncoder(d_model=D, num_heads=H, num_layers=L,
                                   ff_size=F, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, S, D), jnp.float32)
    params = stack.init({"params": jax.random.PRNGKey(0)}, x)["params"]

    ref = stack.apply({"params": params}, x, deterministic=True)
    h = fused_skip_encoder(x, params, L, H, interpret=True)
    norm = params["norm"]
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    out = (h - mu) / jnp.sqrt(var + 1e-5) * norm["scale"] + norm["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_skip_encoder_bf16_weights_close():
    # serving fast path: bf16 weight streaming, f32 accumulate — same
    # contract as XLA "default" matmul precision (budgeted at <5% FID)
    S, B, D, H, F, L = 3, 8, 64, 2, 128, 3
    stack = SkipTransformerEncoder(d_model=D, num_heads=H, num_layers=L,
                                   ff_size=F, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, S, D), jnp.float32)
    params = stack.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    ref = fused_skip_encoder(x, params, L, H, interpret=True)
    out = fused_skip_encoder(x, params, L, H, interpret=True,
                             weight_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.15, rtol=0.1)
    assert not np.allclose(np.asarray(out), np.asarray(ref),
                           atol=1e-7)  # actually ran reduced precision


def test_batch_not_multiple_of_8():
    S, B, D, H, F = 3, 5, 64, 2, 128
    layer = TransformerEncoderLayer(d_model=D, num_heads=H, ff_size=F,
                                    dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, D), jnp.float32)
    params = layer.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    ref = layer.apply({"params": params}, x, deterministic=True)
    out = fused_encoder_layer(x, params, num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)

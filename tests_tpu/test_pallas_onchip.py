"""On-chip (Mosaic-compiled, non-interpret) parity for every Pallas kernel
at FLAGSHIP shapes, under both serving and training matmul precisions.

Interpret-mode tests in tests/ validate kernel math; this lane validates
what Mosaic actually compiles on the chip — the divergence class that
produced the matmul-precision=HIGH crash (commit b1d1088) and the
unbenchmarked fused-decoder regression (VERDICT r2 weak #2/#7).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mld_tpu  # noqa: F401  (applies MLD_TPU_MATMUL_PRECISION)
from mld_tpu.models.denoiser import MldDenoiser
from mld_tpu.models.mld import lengths_to_mask
from mld_tpu.models.vae import MldVae
from mld_tpu.ops.attention import sdpa_pallas, sdpa_xla
from mld_tpu.ops.fused_denoiser import fused_denoiser_forward
from mld_tpu.ops.fused_layer import fused_encoder_layer, fused_skip_encoder
from mld_tpu.ops.fused_seq_decoder import fused_vae_decode
from mld_tpu.ops.transformer import (SkipTransformerEncoder,
                                     TransformerEncoderLayer)

# flagship operating point (config_mld_humanml3d)
D, H, F, L, S = 256, 4, 1024, 9, 3
PRECISIONS = ["highest", "high", "default"]


def _rel(err, ref):
    return err / max(float(np.abs(ref).max()), 1e-6)


@pytest.mark.parametrize("precision", PRECISIONS)
def test_fused_encoder_layer_onchip(precision):
    layer = TransformerEncoderLayer(d_model=D, num_heads=H, ff_size=F,
                                    dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (128, S, D), jnp.float32)
    params = layer.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    with jax.default_matmul_precision(precision):
        ref = np.asarray(jax.jit(lambda x_: layer.apply(
            {"params": params}, x_, deterministic=True))(x))
        out = np.asarray(jax.jit(lambda x_: fused_encoder_layer(
            x_, params, num_heads=H, interpret=False))(x))
    # under "default" the XLA reference itself runs bf16-pass matmuls
    # while the Pallas kernel accumulates f32 -> bf16-grade agreement
    assert _rel(np.abs(out - ref).max(), ref) < (
        5e-4 if precision != "default" else 1e-2)


@pytest.mark.parametrize("precision", PRECISIONS)
def test_fused_skip_encoder_onchip(precision):
    stack = SkipTransformerEncoder(d_model=D, num_heads=H, num_layers=L,
                                   ff_size=F, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (256, S, D), jnp.float32)
    params = stack.init({"params": jax.random.PRNGKey(0)}, x)["params"]

    def fused(x_):
        norm = params["norm"]
        h = fused_skip_encoder(x_, params, L, H, interpret=False)
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
        return (h - mu) / jnp.sqrt(var + 1e-5) * norm["scale"] + norm["bias"]

    with jax.default_matmul_precision(precision):
        ref = np.asarray(jax.jit(lambda x_: stack.apply(
            {"params": params}, x_, deterministic=True))(x))
        out = np.asarray(jax.jit(fused)(x))
    # "default": bf16-pass XLA reference vs f32-accumulating kernel
    assert _rel(np.abs(out - ref).max(), ref) < (
        5e-4 if precision != "default" else 1e-2)


@pytest.mark.parametrize("weight_dtype,precision,tol",
                         [(None, "highest", 5e-4),
                          ("bfloat16", "default", 2e-2)])
def test_fused_denoiser_onchip(weight_dtype, precision, tol):
    """Full serving denoiser forward (timestep MLP + cond proj + 9-layer
    fused stack) at the CFG-doubled flagship batch. The f32 arm pins
    "highest" so the XLA reference is itself f32 (the ambient serving
    default is bf16-pass and cannot agree to 5e-4)."""
    den = MldDenoiser(nfeats=263, condition="text", latent_size=1,
                      latent_dim=D, ff_size=F, num_layers=L, num_heads=H,
                      dropout=0.1, arch="trans_enc", skip_connect=True,
                      text_encoded_dim=768)
    B = 256  # = bench batch 128, CFG-doubled
    sample = jax.random.normal(jax.random.PRNGKey(1), (B, 1, D))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 768))
    params = den.init({"params": jax.random.PRNGKey(0)}, sample,
                      jnp.asarray(0), cond)["params"]
    wd = jnp.bfloat16 if weight_dtype else None
    with jax.default_matmul_precision(precision):
        ref = np.asarray(jax.jit(lambda s, c: den.apply(
            {"params": params}, s, jnp.asarray(981), c))(sample, cond))
        out = np.asarray(jax.jit(lambda s, c: fused_denoiser_forward(
            params, s, jnp.asarray(981), c, num_heads=H, num_layers=L,
            latent_dim=D, text_encoded_dim=768, interpret=False,
            weight_dtype=wd))(sample, cond))
    assert _rel(np.abs(out - ref).max(), ref) < tol


@pytest.mark.parametrize("weight_dtype,precision,tol",
                         [(None, "highest", 5e-4),
                          ("bfloat16", "default", 2e-2)])
def test_fused_vae_decode_onchip(weight_dtype, precision, tol):
    """Whole fused decoder stack at flagship T=196/D=256/9L vs flax decode
    (the kernel that shipped unbenchmarked in round 2). f32 arm pins
    "highest" — see test_fused_denoiser_onchip."""
    vae = MldVae(nfeats=263, latent_size=1, latent_dim=D, ff_size=F,
                 num_layers=L, num_heads=H, dropout=0.0)
    B, T = 32, 196
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 263))
    mask = lengths_to_mask(
        jnp.asarray(np.random.RandomState(0).randint(40, T + 1, B)), T)
    params = vae.init({"params": jax.random.PRNGKey(1)}, feats,
                      mask)["params"]
    z = jax.random.normal(jax.random.PRNGKey(2), (B, 1, D))
    wd = jnp.bfloat16 if weight_dtype else None
    with jax.default_matmul_precision(precision):
        ref = np.asarray(jax.jit(lambda z_: vae.apply(
            {"params": params}, z_, mask, deterministic=True,
            method=vae.decode))(z))
        out = np.asarray(jax.jit(lambda z_: fused_vae_decode(
            params, z_, mask, num_layers=L, num_heads=H, nfeats=263,
            interpret=False, weight_dtype=wd))(z))
    assert _rel(np.abs(out - ref).max(), ref) < tol
    # padded-frame zeroing invariant (mld_vae.py:245)
    assert np.abs(out * ~np.asarray(mask)[..., None]).max() == 0.0


@pytest.mark.parametrize("S_attn,dtype", [(197, jnp.float32),
                                          (514, jnp.bfloat16)])
def test_flash_attention_onchip(S_attn, dtype):
    B, Hh, Dh = 16, 4, 64
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, Hh, S_attn, Dh),
                                 dtype) for i in range(3))
    valid = jnp.arange(S_attn)[None] < jnp.asarray(
        np.random.RandomState(0).randint(8, S_attn + 1, B))[:, None]
    # f32 arm pins "highest": under the ambient serving default the XLA
    # reference's QK/PV matmuls are bf16-pass and can't agree to 5e-4
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    with jax.default_matmul_precision(prec):
        ref = np.asarray(jax.jit(lambda *a: sdpa_xla(*a))(q, k, v, valid),
                         np.float32)
        out = np.asarray(jax.jit(lambda *a: sdpa_pallas(
            *a, interpret=False))(q, k, v, valid), np.float32)
    tol = 2e-2 if dtype == jnp.bfloat16 else 5e-4
    assert _rel(np.abs(out - ref).max(), ref) < tol

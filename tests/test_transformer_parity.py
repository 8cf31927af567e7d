"""Numerical parity: our flax transformer/VAE/denoiser vs the reference torch
modules, with weights converted through utils/torch_convert.

These tests triple as converter validation — the exact path released
checkpoints take.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

import mld_tpu  # noqa: F401  (sets matmul precision)
from mld_tpu.ops.transformer import (
    MultiheadAttention,
    SkipTransformerDecoder,
    SkipTransformerEncoder,
    TransformerEncoderLayer,
)
from mld_tpu.utils.torch_convert import torch_state_dict_to_flax

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference not mounted")

RNG = np.random.RandomState(7)
D, H, FF, LAYERS = 32, 4, 64, 3


def torch_modules():
    add_reference_to_path()
    import torch
    from mld.models.operator import cross_attention as ca
    torch.manual_seed(0)
    return torch, ca


class TestMHAParity:
    def test_self_attention(self):
        torch, _ = torch_modules()
        mha_t = torch.nn.MultiheadAttention(D, H, dropout=0.0)
        mha_t.eval()

        x = RNG.randn(2, 13, D).astype(np.float32)  # [B, S, D]
        valid = np.ones((2, 13), bool)
        valid[1, 9:] = False

        xt = torch.tensor(x).permute(1, 0, 2)  # [S, B, D]
        with torch.no_grad():
            out_t, _ = mha_t(xt, xt, xt,
                             key_padding_mask=torch.tensor(~valid))
        out_t = out_t.permute(1, 0, 2).numpy()

        flax_params = torch_state_dict_to_flax(mha_t.state_dict())
        mha_j = MultiheadAttention(D, H)
        xj = jnp.asarray(x)
        out_j = mha_j.apply({"params": flax_params}, xj, xj, xj,
                            jnp.asarray(valid))
        # padded query rows attend over valid keys only -> compare everywhere
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5)

    def test_cross_attention(self):
        torch, _ = torch_modules()
        mha_t = torch.nn.MultiheadAttention(D, H, dropout=0.0)
        mha_t.eval()
        q = RNG.randn(2, 5, D).astype(np.float32)
        kv = RNG.randn(2, 11, D).astype(np.float32)
        with torch.no_grad():
            out_t, _ = mha_t(torch.tensor(q).permute(1, 0, 2),
                             torch.tensor(kv).permute(1, 0, 2),
                             torch.tensor(kv).permute(1, 0, 2))
        out_t = out_t.permute(1, 0, 2).numpy()
        params = torch_state_dict_to_flax(mha_t.state_dict())
        out_j = MultiheadAttention(D, H).apply(
            {"params": params}, jnp.asarray(q), jnp.asarray(kv),
            jnp.asarray(kv))
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5)


class TestLayerParity:
    def test_encoder_layer_postnorm(self):
        torch, ca = torch_modules()
        layer_t = ca.TransformerEncoderLayer(D, H, FF, 0.0, "gelu", False)
        layer_t.eval()
        x = RNG.randn(2, 13, D).astype(np.float32)
        valid = np.ones((2, 13), bool)
        valid[0, 7:] = False
        with torch.no_grad():
            out_t = layer_t(torch.tensor(x).permute(1, 0, 2),
                            src_key_padding_mask=torch.tensor(~valid))
        out_t = out_t.permute(1, 0, 2).numpy()
        params = torch_state_dict_to_flax(layer_t.state_dict())
        out_j = TransformerEncoderLayer(D, H, FF, 0.0, "gelu", False).apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(valid))
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5)

    def test_skip_encoder(self):
        torch, ca = torch_modules()
        layer_t = ca.TransformerEncoderLayer(D, H, FF, 0.0, "gelu", False)
        enc_t = ca.SkipTransformerEncoder(layer_t, LAYERS,
                                          torch.nn.LayerNorm(D))
        enc_t.eval()
        x = RNG.randn(2, 13, D).astype(np.float32)
        valid = np.ones((2, 13), bool)
        valid[1, 4:] = False
        with torch.no_grad():
            out_t = enc_t(torch.tensor(x).permute(1, 0, 2),
                          src_key_padding_mask=torch.tensor(~valid))
        out_t = out_t.permute(1, 0, 2).numpy()
        params = torch_state_dict_to_flax(enc_t.state_dict())
        enc_j = SkipTransformerEncoder(D, H, LAYERS, FF, 0.0, "gelu", False)
        out_j = enc_j.apply({"params": params}, jnp.asarray(x),
                            jnp.asarray(valid))
        # compare only valid positions (padded-row self-attn outputs feed
        # nothing downstream in the real models)
        np.testing.assert_allclose(np.asarray(out_j)[valid], out_t[valid],
                                   atol=5e-5)

    def test_skip_decoder(self):
        torch, ca = torch_modules()
        layer_t = ca.TransformerDecoderLayer(D, H, FF, 0.0, "gelu", False)
        dec_t = ca.SkipTransformerDecoder(layer_t, LAYERS,
                                          torch.nn.LayerNorm(D))
        dec_t.eval()
        tgt = RNG.randn(2, 9, D).astype(np.float32)
        mem = RNG.randn(2, 3, D).astype(np.float32)
        valid = np.ones((2, 9), bool)
        valid[0, 6:] = False
        with torch.no_grad():
            out_t = dec_t(torch.tensor(tgt).permute(1, 0, 2),
                          torch.tensor(mem).permute(1, 0, 2),
                          tgt_key_padding_mask=torch.tensor(~valid))
        out_t = out_t.permute(1, 0, 2).numpy()
        params = torch_state_dict_to_flax(dec_t.state_dict())
        dec_j = SkipTransformerDecoder(D, H, LAYERS, FF, 0.0, "gelu", False)
        out_j = dec_j.apply({"params": params}, jnp.asarray(tgt),
                            jnp.asarray(mem), jnp.asarray(valid))
        np.testing.assert_allclose(np.asarray(out_j)[valid], out_t[valid],
                                   atol=5e-5)

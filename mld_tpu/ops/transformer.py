"""DETR-style transformer stack (flax.linen), batch-first, mask-driven.

This is the single transformer library shared by the VAE, the denoiser and
the no-VAE variant — mirroring how the reference shares one module
(mld/models/operator/cross_attention.py:18-382), but laid out for TPU:

* batch-first [B, S, D] everywhere (reference is seq-first [S, B, D]);
* variable length is expressed ONLY through boolean validity masks over a
  static padded sequence — no data-dependent shapes under jit;
* attention runs through ops.attention.sdpa (Pallas fused kernel on TPU);
* parameter tree names map 1:1 onto the reference torch modules so released
  checkpoints convert mechanically (utils/torch_convert.py).

`num_layers` must be odd: (n-1)/2 down blocks, a middle block, (n-1)/2 up
blocks with U-Net style concat+linear skip merges
(cross_attention.py:26-64 semantics).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import sdpa


def get_activation(name: str) -> Callable:
    if name == "relu":
        return nn.relu
    if name == "gelu":
        # exact (erf) gelu — torch F.gelu default; jax's default is tanh-approx
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"activation {name} not supported")


class MultiheadAttention(nn.Module):
    """Packed-QKV multi-head attention, torch-MHA-compatible numerics.

    Params: `in_proj` Dense(3*d) (packed q|k|v) and `out_proj` Dense(d);
    loadable from torch `in_proj_weight/in_proj_bias/out_proj`.
    """
    d_model: int
    num_heads: int
    dropout: float = 0.0
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, query, key, value, key_valid=None, *,
                 deterministic: bool = True):
        d = self.d_model
        kernel = self.param("in_proj_kernel",
                            nn.initializers.xavier_uniform(), (d, 3 * d))
        bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        out_proj = nn.Dense(d, name="out_proj")

        if query is key and key is value:
            qkv = query @ kernel + bias
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = query @ kernel[:, :d] + bias[:d]
            k = key @ kernel[:, d:2 * d] + bias[d:2 * d]
            v = value @ kernel[:, 2 * d:] + bias[2 * d:]

        B, Sq, _ = query.shape
        Sk = key.shape[1]
        H, Dh = self.num_heads, d // self.num_heads

        def split(x, S):
            return x.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)

        # torch nn.MultiheadAttention(dropout=p) drops attention probs in
        # training; mirror that when a dropout rng collection is available
        attn_rng = (self.make_rng("dropout")
                    if not deterministic and self.dropout > 0.0 else None)
        out = sdpa(split(q, Sq), split(k, Sk), split(v, Sk),
                   key_valid=key_valid, use_pallas=self.use_pallas,
                   dropout_rate=self.dropout if attn_rng is not None else 0.0,
                   dropout_rng=attn_rng)
        out = out.transpose(0, 2, 1, 3).reshape(B, Sq, d)
        return out_proj(out)


class TransformerEncoderLayer(nn.Module):
    """Post/pre-norm encoder layer (cross_attention.py:236-294 semantics)."""
    d_model: int
    num_heads: int
    ff_size: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, src, key_valid=None, *, deterministic: bool = True):
        act = get_activation(self.activation)
        attn = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                                  self.use_pallas, name="self_attn")
        linear1 = nn.Dense(self.ff_size, name="linear1")
        linear2 = nn.Dense(self.d_model, name="linear2")
        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        drop = lambda x: nn.Dropout(self.dropout)(
            x, deterministic=deterministic) if self.dropout > 0 else x

        if self.normalize_before:
            x = norm1(src)
            src = src + drop(attn(x, x, x, key_valid,
                                  deterministic=deterministic))
            x = norm2(src)
            src = src + drop(linear2(drop(act(linear1(x)))))
            return src
        src = src + drop(attn(src, src, src, key_valid,
                              deterministic=deterministic))
        src = norm1(src)
        src = src + drop(linear2(drop(act(linear1(src)))))
        return norm2(src)


class TransformerDecoderLayer(nn.Module):
    """Decoder layer: self-attn over tgt + cross-attn to memory + FFN."""
    d_model: int
    num_heads: int
    ff_size: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, tgt, memory, tgt_valid=None, memory_valid=None, *,
                 deterministic: bool = True):
        act = get_activation(self.activation)
        self_attn = MultiheadAttention(self.d_model, self.num_heads,
                                       self.dropout, self.use_pallas,
                                       name="self_attn")
        cross_attn = MultiheadAttention(self.d_model, self.num_heads,
                                        self.dropout, self.use_pallas,
                                        name="multihead_attn")
        linear1 = nn.Dense(self.ff_size, name="linear1")
        linear2 = nn.Dense(self.d_model, name="linear2")
        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        norm3 = nn.LayerNorm(name="norm3")
        drop = lambda x: nn.Dropout(self.dropout)(
            x, deterministic=deterministic) if self.dropout > 0 else x

        if self.normalize_before:
            x = norm1(tgt)
            tgt = tgt + drop(self_attn(x, x, x, tgt_valid,
                                       deterministic=deterministic))
            x = norm2(tgt)
            tgt = tgt + drop(cross_attn(x, memory, memory, memory_valid,
                                        deterministic=deterministic))
            x = norm3(tgt)
            tgt = tgt + drop(linear2(drop(act(linear1(x)))))
            return tgt
        tgt = tgt + drop(self_attn(tgt, tgt, tgt, tgt_valid,
                                   deterministic=deterministic))
        tgt = norm1(tgt)
        tgt = tgt + drop(cross_attn(tgt, memory, memory, memory_valid,
                                    deterministic=deterministic))
        tgt = norm2(tgt)
        tgt = tgt + drop(linear2(drop(act(linear1(tgt)))))
        return norm3(tgt)


class SkipTransformerEncoder(nn.Module):
    """U-Net-skip encoder: (n-1)/2 down, middle, (n-1)/2 up with cat+linear."""
    d_model: int
    num_heads: int
    num_layers: int
    ff_size: int = 1024
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, src, key_valid=None, *, deterministic: bool = True):
        assert self.num_layers % 2 == 1, "skip encoder needs odd num_layers"
        n_block = (self.num_layers - 1) // 2
        layer = lambda name: TransformerEncoderLayer(
            self.d_model, self.num_heads, self.ff_size, self.dropout,
            self.activation, self.normalize_before, self.use_pallas, name=name)

        x = src
        stack = []
        for i in range(n_block):
            x = layer(f"input_blocks_{i}")(x, key_valid,
                                           deterministic=deterministic)
            stack.append(x)
        x = layer("middle_block")(x, key_valid, deterministic=deterministic)
        for i in range(n_block):
            x = jnp.concatenate([x, stack.pop()], axis=-1)
            x = nn.Dense(self.d_model, name=f"linear_blocks_{i}")(x)
            x = layer(f"output_blocks_{i}")(x, key_valid,
                                            deterministic=deterministic)
        return nn.LayerNorm(name="norm")(x)


class SkipTransformerDecoder(nn.Module):
    """U-Net-skip decoder (cross_attention.py:66-125 semantics)."""
    d_model: int
    num_heads: int
    num_layers: int
    ff_size: int = 1024
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, tgt, memory, tgt_valid=None, memory_valid=None, *,
                 deterministic: bool = True):
        assert self.num_layers % 2 == 1, "skip decoder needs odd num_layers"
        n_block = (self.num_layers - 1) // 2
        layer = lambda name: TransformerDecoderLayer(
            self.d_model, self.num_heads, self.ff_size, self.dropout,
            self.activation, self.normalize_before, self.use_pallas, name=name)

        x = tgt
        stack = []
        for i in range(n_block):
            x = layer(f"input_blocks_{i}")(x, memory, tgt_valid, memory_valid,
                                           deterministic=deterministic)
            stack.append(x)
        x = layer("middle_block")(x, memory, tgt_valid, memory_valid,
                                  deterministic=deterministic)
        for i in range(n_block):
            x = jnp.concatenate([x, stack.pop()], axis=-1)
            x = nn.Dense(self.d_model, name=f"linear_blocks_{i}")(x)
            x = layer(f"output_blocks_{i}")(x, memory, tgt_valid, memory_valid,
                                            deterministic=deterministic)
        return nn.LayerNorm(name="norm")(x)


class TransformerEncoder(nn.Module):
    """Plain stacked encoder (cross_attention.py:171-192)."""
    d_model: int
    num_heads: int
    num_layers: int
    ff_size: int = 1024
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    final_norm: bool = False
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, src, key_valid=None, *, deterministic: bool = True):
        x = src
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.num_heads, self.ff_size, self.dropout,
                self.activation, self.normalize_before, self.use_pallas,
                name=f"layers_{i}")(x, key_valid, deterministic=deterministic)
        if self.final_norm:
            x = nn.LayerNorm(name="norm")(x)
        return x


class TransformerDecoder(nn.Module):
    """Plain stacked decoder with final norm (cross_attention.py:195-233);
    final_norm=False gives the torch nn.TransformerDecoder(norm=None)
    variant used by ActorVae."""
    d_model: int
    num_heads: int
    num_layers: int
    ff_size: int = 1024
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    final_norm: bool = True
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, tgt, memory, tgt_valid=None, memory_valid=None, *,
                 deterministic: bool = True):
        x = tgt
        for i in range(self.num_layers):
            x = TransformerDecoderLayer(
                self.d_model, self.num_heads, self.ff_size, self.dropout,
                self.activation, self.normalize_before, self.use_pallas,
                name=f"layers_{i}")(x, memory, tgt_valid, memory_valid,
                                    deterministic=deterministic)
        if self.final_norm:
            x = nn.LayerNorm(name="norm")(x)
        return x

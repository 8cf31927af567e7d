"""Frozen t2m evaluator networks (R-precision / MM-Dist / FID features).

Parity targets:
  TextEncoderBiGRUCo     — mld/models/architectures/t2m_textenc.py:6-48
  MovementConvEncoder    — mld/models/architectures/t2m_motionenc.py:6-26
  MotionEncoderBiGRUCo   — mld/models/architectures/t2m_motionenc.py:29-64

GRUs run as masked lax.scan (ops/gru.py) with pack_padded-equivalent
semantics; weights load from the reference's `text_mot_match/model/finest.tar`
via utils/torch_convert (the GRU/conv param names line up 1:1).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mld_tpu.ops.gru import BiGRU


def leaky_relu_02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class OutputNet(nn.Module):
    """Linear -> LayerNorm -> LeakyReLU(0.2) -> Linear head shared by both
    BiGRU encoders (torch Sequential indices 0/1/3 preserved in names)."""
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, name="output_net_0")(x)
        x = nn.LayerNorm(name="output_net_1")(x)
        x = leaky_relu_02(x)
        return nn.Dense(self.output_size, name="output_net_3")(x)


class TextEncoderBiGRUCo(nn.Module):
    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        """[B, S, 300], [B, S, 15], [B] -> [B, output_size]."""
        B = word_embs.shape[0]
        pos_embs = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        inputs = word_embs + pos_embs
        input_embs = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        hidden = self.param("hidden", nn.initializers.normal(1.0),
                            (2, 1, self.hidden_size))
        h0 = jnp.broadcast_to(hidden, (2, B, self.hidden_size))
        _, final = BiGRU(self.hidden_size, self.hidden_size,
                         name="gru")(input_embs, cap_lens, h0)
        gru_last = jnp.concatenate([final[0], final[1]], axis=-1)
        return OutputNet(self.hidden_size, self.output_size,
                         name="out")(gru_last)


class MovementConvEncoder(nn.Module):
    """Strided Conv1d movement encoder (input nfeats-4, /4 downsample)."""
    input_size: int = 259
    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, inputs):
        """[B, T, input_size] -> [B, T//4, output_size]."""
        x = nn.Conv(self.hidden_size, kernel_size=(4,), strides=(2,),
                    padding=((1, 1),), name="main_0")(inputs)
        x = leaky_relu_02(x)
        x = nn.Conv(self.output_size, kernel_size=(4,), strides=(2,),
                    padding=((1, 1),), name="main_3")(x)
        x = leaky_relu_02(x)
        return nn.Dense(self.output_size, name="out_net")(x)


class MotionEncoderBiGRUCo(nn.Module):
    input_size: int = 512
    hidden_size: int = 1024
    output_size: int = 512

    @nn.compact
    def __call__(self, inputs, m_lens):
        """[B, T, input_size], [B] -> [B, output_size]."""
        B = inputs.shape[0]
        input_embs = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        hidden = self.param("hidden", nn.initializers.normal(1.0),
                            (2, 1, self.hidden_size))
        h0 = jnp.broadcast_to(hidden, (2, B, self.hidden_size))
        _, final = BiGRU(self.hidden_size, self.hidden_size,
                         name="gru")(input_embs, m_lens, h0)
        gru_last = jnp.concatenate([final[0], final[1]], axis=-1)
        return OutputNet(self.hidden_size, self.output_size,
                         name="out")(gru_last)


def convert_t2m_checkpoint(tar_path: str) -> dict:
    """Load the reference's finest.tar and convert all three evaluator nets.

    Returns {"textencoder": params, "movementencoder": params,
    "motionencoder": params}.
    """
    import torch
    from mld_tpu.utils.torch_convert import torch_state_dict_to_flax

    ckpt = torch.load(tar_path, map_location="cpu", weights_only=False)

    def conv(state, net):
        remapped = {}
        for k, v in state.items():
            k2 = k
            if k2.startswith("main."):
                k2 = "main_" + k2[len("main."):]
            if k2.startswith("output_net."):
                k2 = "out.output_net_" + k2[len("output_net."):]
            if k2.startswith("gru."):
                k2 = "gru/" + k2[len("gru."):]
                remapped[k2.replace("/", ".")] = v
                continue
            remapped[k2] = v
        tree = torch_state_dict_to_flax(remapped)
        # torch GRU params are flat names, keep under "gru"
        return tree

    return {
        "textencoder": conv(ckpt["text_encoder"], "text"),
        "movementencoder": conv(ckpt["movement_encoder"], "move"),
        "motionencoder": conv(ckpt["motion_encoder"], "motion"),
    }

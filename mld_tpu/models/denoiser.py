"""MldDenoiser — latent-space conditional transformer denoiser (flax.linen).

Token sequence (trans_enc, latent mode): [sample tokens ; time token ; cond
tokens] — sample first, condition appended after, matching the reference
ordering (mld_denoiser.py:187). In ``diffusion_only`` (no-VAE) mode the
condition tokens come FIRST and the sample is the embedded raw motion
(mld_denoiser.py:184-185), with padded output frames zeroed.

Behavioral parity target: mld/models/architectures/mld_denoiser.py:16-279.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mld_tpu.ops.embeddings import (
    TimestepEmbedding,
    Timesteps,
    build_position_encoding,
)
from mld_tpu.ops.transformer import (
    SkipTransformerEncoder,
    TransformerDecoder,
    TransformerEncoder,
)


class EmbedAction(nn.Module):
    """Class-conditional embedding with classifier-free-guidance masking
    (mld_denoiser.py:231-279)."""
    num_actions: int
    latent_dim: int
    guidance_scale: float = 7.5
    guidance_uncondp: float = 0.1
    force_mask: bool = False

    @nn.compact
    def __call__(self, action_ids: jnp.ndarray, *, training: bool = False,
                 rng: Optional[jax.Array] = None):
        """action_ids: [B] int (or [B, 1]) -> [B, 1, latent_dim].

        Eval with guidance: the first half of the batch is the uncond half and
        is zeroed (reference chunks the doubled CFG batch).
        """
        table = self.param("action_embedding",
                           nn.initializers.xavier_uniform(),
                           (self.num_actions, self.latent_dim))
        ids = action_ids.reshape(-1).astype(jnp.int32)
        out = table[ids]
        B = out.shape[0]

        if self.force_mask:
            out = jnp.zeros_like(out)
        elif training and self.guidance_uncondp > 0.0 and rng is not None:
            keep = jax.random.bernoulli(
                rng, 1.0 - self.guidance_uncondp, (B, 1))
            out = out * keep
        elif (not training) and self.guidance_scale > 1.0:
            half = B // 2
            is_uncond = (jnp.arange(B) < half)[:, None]
            out = jnp.where(is_uncond, 0.0, out)
        return out[:, None, :]


class MldDenoiser(nn.Module):
    nfeats: int = 263
    condition: str = "text"  # "text" | "text_uncond" | "action"
    latent_size: int = 1
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    normalize_before: bool = False
    activation: str = "gelu"
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    position_embedding: str = "learned"
    arch: str = "trans_enc"  # or "trans_dec"
    skip_connect: bool = True
    diffusion_only: bool = False  # no-VAE: denoise raw 263-dim motion
    text_encoded_dim: int = 768
    nclasses: int = 10
    guidance_scale: float = 7.5
    guidance_uncondp: float = 0.1
    # learned-PE table length (reference fixes 500, position_encoding.py:140;
    # raised for the >500-frame stress preset)
    pe_max_len: int = 500
    use_pallas: Optional[bool] = None

    def setup(self):
        d = self.latent_dim
        if self.diffusion_only:
            self.pose_embd = nn.Dense(d)
            self.pose_proj = nn.Dense(self.nfeats)

        if self.condition in ("text", "text_uncond"):
            self.time_proj = Timesteps(self.text_encoded_dim,
                                       self.flip_sin_to_cos, self.freq_shift)
            self.time_embedding = TimestepEmbedding(d)
            if self.text_encoded_dim != d:
                self.emb_proj = nn.Dense(d)
        elif self.condition == "action":
            self.time_proj = Timesteps(d, self.flip_sin_to_cos,
                                       self.freq_shift)
            self.time_embedding = TimestepEmbedding(d)
            self.emb_proj_action = EmbedAction(
                self.nclasses, d, self.guidance_scale, self.guidance_uncondp)
        else:
            raise ValueError(f"condition {self.condition} not supported")

        self.query_pos = build_position_encoding(
            d, self.position_embedding, max_len=self.pe_max_len)
        if self.arch == "trans_enc":
            if self.skip_connect:
                self.encoder = SkipTransformerEncoder(
                    d, self.num_heads, self.num_layers, self.ff_size,
                    self.dropout, self.activation, self.normalize_before,
                    self.use_pallas)
            else:
                self.encoder = TransformerEncoder(
                    d, self.num_heads, self.num_layers, self.ff_size,
                    self.dropout, self.activation, self.normalize_before,
                    use_pallas=self.use_pallas)
        elif self.arch == "trans_dec":
            self.mem_pos = build_position_encoding(
                d, self.position_embedding, max_len=self.pe_max_len)
            self.decoder = TransformerDecoder(
                d, self.num_heads, self.num_layers, self.ff_size, self.dropout,
                self.activation, self.normalize_before,
                use_pallas=self.use_pallas)
        else:
            raise ValueError(f"arch {self.arch} not supported")

    def __call__(self, sample: jnp.ndarray, timestep: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True, training: bool = False,
                 cond_rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """One denoising step.

        sample: [B, latent_size, latent_dim] (latent mode) or [B, T, nfeats]
            (diffusion_only).
        timestep: scalar or [B] int timesteps.
        encoder_hidden_states: [B, S_text, text_encoded_dim] for text, or
            [B] action ids for action conditioning.
        mask: [B, T] frame validity (diffusion_only output zeroing only —
            the reference attends over padded frames too).
        """
        B = sample.shape[0]
        timesteps = jnp.broadcast_to(jnp.asarray(timestep), (B,))

        time_emb = self.time_proj(timesteps).astype(sample.dtype)
        time_emb = self.time_embedding(time_emb)[:, None, :]  # [B, 1, d]

        if self.condition in ("text", "text_uncond"):
            text_emb = encoder_hidden_states  # [B, S, text_dim]
            if self.text_encoded_dim != self.latent_dim:
                # reference applies ReLU before the projection
                text_emb_latent = self.emb_proj(nn.relu(text_emb))
            else:
                text_emb_latent = text_emb
            emb_latent = jnp.concatenate([time_emb, text_emb_latent], axis=1)
        else:
            action_emb = self.emb_proj_action(
                encoder_hidden_states, training=training, rng=cond_rng)
            emb_latent = jnp.concatenate([time_emb, action_emb], axis=1)

        if self.arch == "trans_enc":
            if self.diffusion_only:
                sample_emb = self.pose_embd(sample)
                xseq = jnp.concatenate([emb_latent, sample_emb], axis=1)
            else:
                xseq = jnp.concatenate([sample, emb_latent], axis=1)

            xseq = self.query_pos(xseq)
            tokens = self.encoder(xseq, deterministic=deterministic)

            if self.diffusion_only:
                out = self.pose_proj(tokens[:, emb_latent.shape[1]:])
                if mask is not None:
                    out = out * mask[..., None]
            else:
                out = tokens[:, : sample.shape[1]]
        else:  # trans_dec
            tgt = self.pose_embd(sample) if self.diffusion_only else sample
            tgt = self.query_pos(tgt)
            memory = self.mem_pos(emb_latent)
            out = self.decoder(tgt, memory, deterministic=deterministic)
            if self.diffusion_only:
                out = self.pose_proj(out)
                if mask is not None:
                    out = out * mask[..., None]
        return out

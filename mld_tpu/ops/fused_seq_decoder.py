"""Fused VAE-decoder stack for LONG token sequences (Pallas, TPU).

The flagship VAE decoder (models/vae.py decode, arch=encoder_decoder) is a
9-layer SkipTransformerDecoder over T~196 frame queries cross-attending a
1-token latent. Per serving batch it is ~40% of end-to-end sampling time
under XLA (docs/ROUND2.md breakdown): every layer round-trips [B, S, D]
activations and [B, H, S, S] score tensors through HBM across ~10 fusion
boundaries.

This kernel runs the ENTIRE stack in one pallas_call with a
(batch-tiles, layers) grid, layers fastest: for each tile of TB batch
rows, the [TB*S, D] activation lives in VMEM scratch across all L layers,
the U-Net skip stack lives in VMEM scratch, and per-layer weights stream
through double-buffered VMEM blocks (bf16 in the serving fast path).
Attention (self over S masked keys + cross over M latent tokens) runs
per (b, h) as [S, Dh] x [Dh, S] MXU ops with f32 softmax entirely
in-register/VMEM — the [S, S] score tile never touches HBM.

Numerics match ops/transformer.SkipTransformerDecoder (post-norm,
deterministic): f32 accumulation, f32 softmax/layernorm (eps 1e-5),
A&S-7.1.26 exact gelu. Inference-only; training keeps the XLA path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .fused_layer import (_HAS_PLTPU, _erf_gelu, _layer_norm, _mm,
                          _round_up, _stack_layer_params, pltpu)

NEG_INF = -1e9


def _attend(q, k, v, key_mask, H):
    """Per-(batch-row, head) attention. q [S, D] (pre-scaled), k/v [Sk, D],
    key_mask [1, Sk] f32 (1 = attend) or None. Returns [S, D] f32."""
    D = q.shape[-1]
    Dh = D // H
    heads = []
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # [S, Sk]
        if key_mask is not None:
            s = jnp.where(key_mask > 0, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        heads.append(jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))          # [S, Dh]
    return jnp.concatenate(heads, axis=-1)


def _decoder_kernel(tgt_ref, mem_ref, valid_ref,
                    wqkv_s_ref, bqkv_s_ref, wo_s_ref, bo_s_ref,
                    wqkv_x_ref, bqkv_x_ref, wo_x_ref, bo_x_ref,
                    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                    ln3s_ref, ln3b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    wsx_ref, wss_ref, bs_ref,
                    o_ref, x_scr, stack_scr,
                    *, TB, Sp, Mp, M, H, scale, n_block, ffn_chunks):
    l = pl.program_id(1)
    f32 = jnp.float32
    D = x_scr.shape[-1]

    @pl.when(l == 0)
    def _():
        x_scr[...] = tgt_ref[...].reshape(TB * Sp, D).astype(f32)

    x = x_scr[...]

    # U-Net skip: concat([x, stack.pop()]) @ Wskip decomposed into row
    # blocks (output blocks only, l > n_block)
    pop = jnp.clip(2 * n_block - l, 0, n_block - 1)
    skip = stack_scr[pl.dslice(pop, 1)][0]
    xs = (_mm(x, wsx_ref[0]) + _mm(skip, wss_ref[0])
          + bs_ref[0][0].astype(f32)[None, :])
    x = jnp.where(l > n_block, xs, x)

    # ---- self-attention over Sp frame tokens (key-padding masked) ----
    qkv = _mm(x, wqkv_s_ref[0]) + bqkv_s_ref[0][0].astype(f32)[None, :]
    q = qkv[:, :D] * scale
    k = qkv[:, D:2 * D]
    v = qkv[:, 2 * D:]
    valid = valid_ref[...].astype(f32)                    # [TB, 1, Sp]
    attn = jnp.concatenate([
        _attend(q[b * Sp:(b + 1) * Sp], k[b * Sp:(b + 1) * Sp],
                v[b * Sp:(b + 1) * Sp], valid[b], H)
        for b in range(TB)], axis=0)
    x = _layer_norm(x + _mm(attn, wo_s_ref[0])
                    + bo_s_ref[0][0].astype(f32)[None, :],
                    ln1s_ref[0][0].astype(f32), ln1b_ref[0][0].astype(f32))

    # ---- cross-attention to Mp latent tokens (pad keys masked) ----
    wqkv_x = wqkv_x_ref[0]
    bqkv_x = bqkv_x_ref[0][0].astype(f32)
    mem = mem_ref[...].reshape(TB * Mp, D).astype(f32)
    qx = (_mm(x, wqkv_x[:, :D]) + bqkv_x[:D][None, :]) * scale
    km = _mm(mem, wqkv_x[:, D:2 * D]) + bqkv_x[D:2 * D][None, :]
    vm = _mm(mem, wqkv_x[:, 2 * D:]) + bqkv_x[2 * D:][None, :]
    mem_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
                < M).astype(f32)
    cross = jnp.concatenate([
        _attend(qx[b * Sp:(b + 1) * Sp], km[b * Mp:(b + 1) * Mp],
                vm[b * Mp:(b + 1) * Mp], mem_mask, H)
        for b in range(TB)], axis=0)
    x = _layer_norm(x + _mm(cross, wo_x_ref[0])
                    + bo_x_ref[0][0].astype(f32)[None, :],
                    ln2s_ref[0][0].astype(f32), ln2b_ref[0][0].astype(f32))

    # ---- FFN (row-chunked: the [TB*Sp, F] temp would dominate VMEM) ----
    b1 = b1_ref[0][0].astype(f32)
    b2 = b2_ref[0][0].astype(f32)
    rows = TB * Sp
    chunk = rows // ffn_chunks
    ff_out = []
    for c in range(ffn_chunks):
        xc = x[c * chunk:(c + 1) * chunk]
        ff = _erf_gelu(_mm(xc, w1_ref[0]) + b1[None, :])
        ff_out.append(_mm(ff, w2_ref[0]) + b2[None, :])
    x = _layer_norm(x + jnp.concatenate(ff_out, axis=0),
                    ln3s_ref[0][0].astype(f32), ln3b_ref[0][0].astype(f32))

    @pl.when(l < n_block)
    def _():
        stack_scr[pl.dslice(l, 1)] = x[None].astype(stack_scr.dtype)

    x_scr[...] = x
    o_ref[...] = x.reshape(TB, Sp, D).astype(o_ref.dtype)


def _stack_decoder_params(layers):
    """Stacked decoder-layer params with a leading layer axis."""
    def st(path, twod):
        rows = []
        for p in layers:
            a = p
            for key in path:
                a = a[key]
            rows.append(a if twod else a.reshape(1, -1))
        return jnp.stack(rows)

    return (st(("self_attn", "in_proj_kernel"), True),
            st(("self_attn", "in_proj_bias"), False),
            st(("self_attn", "out_proj", "kernel"), True),
            st(("self_attn", "out_proj", "bias"), False),
            st(("multihead_attn", "in_proj_kernel"), True),
            st(("multihead_attn", "in_proj_bias"), False),
            st(("multihead_attn", "out_proj", "kernel"), True),
            st(("multihead_attn", "out_proj", "bias"), False),
            st(("norm1", "scale"), False), st(("norm1", "bias"), False),
            st(("norm2", "scale"), False), st(("norm2", "bias"), False),
            st(("norm3", "scale"), False), st(("norm3", "bias"), False),
            st(("linear1", "kernel"), True), st(("linear1", "bias"), False),
            st(("linear2", "kernel"), True), st(("linear2", "bias"), False))


def can_fuse_decode(vae, latent_size: int) -> bool:
    """Fused decode applies to: MldVae encoder_decoder arch, post-norm,
    learned PE (models/vae.py decode, the flagship configuration).
    ActorVae/VPosert have no `arch` attribute — getattr so their presets
    fall through to the XLA path instead of crashing."""
    return (getattr(vae, "arch", None) == "encoder_decoder"
            and not vae.normalize_before
            and vae.position_embedding in ("v3", "learned")
            and latent_size <= 8)


def fused_vae_decode(vae_params, z, mask, *, num_layers: int,
                     num_heads: int, nfeats: int,
                     interpret: Optional[bool] = None,
                     weight_dtype=None, tile_b: int = 4):
    """Serving-path MldVae.decode over the raw param tree (vae.py decode,
    encoder_decoder arch): zero queries + learned PE -> fused decoder
    stack -> final LayerNorm -> feature projection -> frame-mask zeroing.
    Parameter tree is IDENTICAL to the flax module."""
    B, T = mask.shape
    D = z.shape[-1]
    pe = vae_params["query_pos_decoder"]["pe"]            # [max_len, 1, D]
    queries = jnp.broadcast_to(pe[:T, 0][None], (B, T, D)).astype(z.dtype)

    h = fused_skip_decoder(queries, z, mask, vae_params["decoder"],
                           num_layers, num_heads, interpret=interpret,
                           weight_dtype=weight_dtype, tile_b=tile_b)
    norm = vae_params["decoder"]["norm"]
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    h = (h - mu) / jnp.sqrt(var + 1e-5) * norm["scale"] + norm["bias"]

    fl = vae_params["final_layer"]
    feats = h @ fl["kernel"] + fl["bias"]
    return feats * mask[..., None]


def fused_skip_decoder(tgt, mem, valid, dec_params, num_layers: int,
                       num_heads: int, interpret: Optional[bool] = None,
                       weight_dtype=None, tile_b: int = 4,
                       ffn_chunks: int = 2):
    """The full SkipTransformerDecoder stack (sans final norm) as ONE
    pallas_call. tgt [B, S, D] queries (PE applied), mem [B, M, D] latent,
    valid [B, S] frame mask; dec_params: flax param tree of
    ops.transformer.SkipTransformerDecoder. Returns [B, S, D] pre-norm.
    """
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:  # pragma: no cover
            interpret = True
    n_block = (num_layers - 1) // 2
    layers = ([dec_params[f"input_blocks_{i}"] for i in range(n_block)]
              + [dec_params["middle_block"]]
              + [dec_params[f"output_blocks_{i}"]
                 for i in range(n_block)])
    stacked = _stack_decoder_params(layers)

    skips = [dec_params[f"linear_blocks_{i}"] for i in range(n_block)]
    B, S, D = tgt.shape
    M = mem.shape[1]
    wsx = jnp.stack([p["kernel"][:D] for p in skips])
    wss = jnp.stack([p["kernel"][D:] for p in skips])
    bs = jnp.stack([p["bias"].reshape(1, -1) for p in skips])

    if weight_dtype is not None:
        wd = jnp.dtype(weight_dtype)
        # 2-D mats only (indices per _stack_decoder_params layout)
        twod = {0, 2, 4, 6, 14, 16}
        stacked = tuple(a.astype(wd) if i in twod else a
                        for i, a in enumerate(stacked))
        wsx, wss = wsx.astype(wd), wss.astype(wd)

    H = num_heads
    scale = 1.0 / float(np.sqrt(D // H))
    L = 2 * n_block + 1
    TB = tile_b
    Sp = _round_up(S, 8)
    Mp = _round_up(max(M, 8), 8)
    Bp = _round_up(B, TB)

    if Sp != S or Bp != B:
        tgt = jnp.pad(tgt, ((0, Bp - B), (0, Sp - S), (0, 0)))
        valid = jnp.pad(valid, ((0, Bp - B), (0, Sp - S)))
    elif Bp != B:  # pragma: no cover
        tgt = jnp.pad(tgt, ((0, Bp - B), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, Bp - B), (0, 0)))
    if Mp != M or Bp != B:
        mem = jnp.pad(mem, ((0, Bp - B), (0, Mp - M), (0, 0)))
    valid = valid.astype(jnp.int32)
    # all-pad query rows still need >=1 attendable key for a finite
    # softmax; key-masking guarantees it only when the row itself is real.
    # Padded rows attend everything and are discarded by the caller.
    valid = jnp.maximum(valid, (jnp.arange(Sp) == 0).astype(jnp.int32))
    # [B, 1, Sp]: a (TB, Sp) block violates the (8, 128)-divisibility rule
    # on sublanes for TB < 8; with a singleton sublane dim the block equals
    # the array on the last two dims
    valid = valid[:, None, :]

    lead = lambda a: pl.BlockSpec((1,) + a.shape[1:],
                                  lambda bt, l: (l,) + (0,) * (a.ndim - 1))
    skip_spec = lambda a: pl.BlockSpec(
        (1,) + a.shape[1:],
        lambda bt, l: (jnp.clip(l - n_block - 1, 0, n_block - 1),)
        + (0,) * (a.ndim - 1))
    in_specs = ([pl.BlockSpec((TB, Sp, D), lambda bt, l: (bt, 0, 0)),
                 pl.BlockSpec((TB, Mp, D), lambda bt, l: (bt, 0, 0)),
                 pl.BlockSpec((TB, 1, Sp), lambda bt, l: (bt, 0, 0))]
                + [lead(a) for a in stacked]
                + [skip_spec(a) for a in (wsx, wss, bs)])

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)

    F = stacked[14].shape[-1]
    out = pl.pallas_call(
        functools.partial(_decoder_kernel, TB=TB, Sp=Sp, Mp=Mp, M=M, H=H,
                          scale=scale, n_block=n_block,
                          ffn_chunks=ffn_chunks),
        grid=(Bp // TB, L),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, Sp, D), lambda bt, l: (bt, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, Sp, D), tgt.dtype),
        scratch_shapes=([pltpu.VMEM((TB * Sp, D), jnp.float32),
                         pltpu.VMEM((max(n_block, 1), TB * Sp, D),
                                    jnp.float32)]
                        if _HAS_PLTPU else None),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=L * Bp * (2 * Sp * D * (3 * D + 2 * D + 2 * D + 2 * F)
                            + 4 * Sp * Sp * D + 4 * Sp * Mp * D)
            + n_block * 4 * Bp * Sp * D * D,
            bytes_accessed=4 * Bp * Sp * D * 2
            + (Bp // TB) * 2 * L * D * (8 * D + 2 * F),
            transcendentals=L * Bp * Sp * (F + Sp + Mp),
        ),
        **kwargs,
    )(tgt, mem, valid, *stacked, wsx, wss, bs)
    return out[:B, :S]

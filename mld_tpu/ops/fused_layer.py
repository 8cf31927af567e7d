"""Fused transformer layer for SHORT token sequences (Pallas, TPU).

The MLD latent denoiser runs 9 post-norm encoder layers over just S=3
tokens ([sample; time; text]) 50 times per sampled motion
(mld_denoiser.py:135-228 drive). At that scale the cost is not FLOPs but
kernel-launch / fusion-boundary overhead: XLA emits ~6 fusions per layer
(qkv proj, attention, out proj, 2 layernorms, FFN), each a trip through
HBM for [B, S, D] activations. This kernel computes the ENTIRE layer —
packed QKV, multi-head attention over S tokens, out-proj, residual +
LayerNorm, FFN (erf-gelu), residual + LayerNorm — in ONE pallas_call with
every weight and activation resident in VMEM.

Layout: tokens are COLLAPSED into the sublane axis — x is [S*B, D] with
token i occupying rows [i*B, (i+1)*B). Every projection is then a single
[S*B, D] x [D, K] MXU op (vs 3 per-token ops), and attention runs as S
score matmuls over the full collapsed Q:
  scores_j = (Q * tile_S(k_j)) @ seg_sum      -> [S*B, H]
  attn     = sum_j softmax_j(scores)_j @ seg_expand * tile_S(v_j)
with seg_sum/seg_expand 0/1 head-segment matrices built from iota
(per-head lane-group row sums / broadcasts).

Numerics match ops/transformer.TransformerEncoderLayer (post-norm,
deterministic): fp32 accumulation on the MXU, fp32 softmax, torch-default
LayerNorm eps 1e-5, exact (erf) gelu via the Abramowitz-Stegun 7.1.26
polynomial (Pallas TPU has no erf primitive; max |err| 1.5e-7 = f32 eps).
Inference kernel (no dropout); training falls back to the XLA path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

MAX_S = 8  # short-sequence regime; latent mode uses 3-4 tokens


def _round_up(x, m):
    return (x + m - 1) // m * m


def _mm(a, w):  # [R, D?] @ [D?, K] fp32 accumulation on the MXU
    # operands may be bf16 (serving fast path) or f32; accumulate f32.
    # Precision is pinned per-dtype: in-kernel dots otherwise inherit the
    # GLOBAL jax_default_matmul_precision and Mosaic rejects HIGH.
    prec = (jax.lax.Precision.DEFAULT if w.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(
        a.astype(w.dtype), w, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)


def _erf_gelu(h):
    # exact gelu; Pallas TPU has no erf/erfc primitive, so erf comes from
    # Abramowitz-Stegun 7.1.26 (max |err| 1.5e-7 ~ f32 eps —
    # indistinguishable from XLA's erf at the 5e-5 parity tolerance)
    a = jnp.abs(h) * 0.7071067811865476
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.sign(h) * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * h * (1.0 + erf)


def _layer_norm(h, scale, bias):
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    hn = (h - mu) * jax.lax.rsqrt(var + 1e-5)
    return hn * scale[None, :] + bias[None, :]


def _tile_tokens(block, S):
    # [B, D] -> [S*B, D] vertical tiling (token-broadcast along sublanes)
    return jnp.concatenate([block] * S, axis=0)


def _layer_body(x, wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2,
                ln2s, ln2b, *, S, H, scale):
    """One post-norm encoder layer on collapsed-token rows.

    x: [S*B, D] fp32 (token i = rows [i*B, (i+1)*B)). Weights fp32,
    1-D params as [K] vectors. Returns [S*B, D] fp32.
    """
    SB, D = x.shape
    B = SB // S
    Dh = D // H

    # head-segment matrices from iota (built in-kernel, no extra inputs)
    lane = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // Dh
    head = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    seg_sum = (lane == head).astype(jnp.float32)        # [D, H]
    seg_expand = seg_sum.T                               # [H, D]

    # ---- packed QKV projection, all tokens in one matmul ----
    # matmul operands follow the weights' dtype (bf16 streaming in the
    # serving fast path); softmax / layernorm / residuals stay f32
    qkv = _mm(x, wqkv) + bqkv[None, :]
    q = qkv[:, :D] * scale                               # [S*B, D]
    k = qkv[:, D:2 * D]
    v = qkv[:, 2 * D:]

    # ---- attention over S tokens; scores as [S*B, H] per key token ----
    kt = [_tile_tokens(k[j * B:(j + 1) * B], S) for j in range(S)]
    vt = [_tile_tokens(v[j * B:(j + 1) * B], S) for j in range(S)]
    scores = [_mm(q * kt[j], seg_sum) for j in range(S)]  # S x [S*B, H]
    m = scores[0]
    for j in range(1, S):
        m = jnp.maximum(m, scores[j])
    exps = [jnp.exp(s - m) for s in scores]
    denom = exps[0]
    for j in range(1, S):
        denom = denom + exps[j]
    inv = 1.0 / denom
    attn = _mm(exps[0] * inv, seg_expand) * vt[0]
    for j in range(1, S):
        attn = attn + _mm(exps[j] * inv, seg_expand) * vt[j]

    # ---- out-proj + residual + LN, FFN + residual + LN ----
    h = x + _mm(attn, wo) + bo[None, :]
    h = _layer_norm(h, ln1s, ln1b)
    ff = _mm(h, w1) + b1[None, :]
    ff = _erf_gelu(ff)
    ff = _mm(ff, w2) + b2[None, :]
    return _layer_norm(h + ff, ln2s, ln2b)


def _layer_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  ln2s_ref, ln2b_ref, o_ref, *, S, H, scale):
    f32 = jnp.float32
    out = _layer_body(
        x_ref[...].astype(f32),
        wqkv_ref[...], bqkv_ref[0].astype(f32),
        wo_ref[...], bo_ref[0].astype(f32),
        ln1s_ref[0].astype(f32), ln1b_ref[0].astype(f32),
        w1_ref[...], b1_ref[0].astype(f32),
        w2_ref[...], b2_ref[0].astype(f32),
        ln2s_ref[0].astype(f32), ln2b_ref[0].astype(f32),
        S=S, H=H, scale=scale)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "interpret"))
def fused_encoder_layer_sbd(x, wqkv, bqkv, wo, bo, ln1s, ln1b,
                            w1, b1, w2, b2, ln2s, ln2b, *,
                            num_heads: int, interpret: bool = False):
    """x: [S, B, D] -> [S, B, D]; one fused post-norm encoder layer.

    Weights follow torch-Linear orientation already transposed to
    [in, out] (flax kernels): wqkv [D, 3D], wo [D, D], w1 [D, F],
    w2 [F, D]; 1-D params are passed as [1, K] rows.
    """
    S, B, D = x.shape
    F = w1.shape[1]
    assert S <= MAX_S, f"fused layer is for short sequences (S={S})"
    scale = 1.0 / float(np.sqrt(D // num_heads))

    Bp = _round_up(max(B, 8), 8)
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, Bp - B), (0, 0)))
    xr = x.reshape(S * Bp, D)  # collapse tokens into sublanes

    row = lambda a: a.reshape(1, -1)
    args = (xr, wqkv, row(bqkv), wo, row(bo), row(ln1s), row(ln1b),
            w1, row(b1), w2, row(b2), row(ln2s), row(ln2b))

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
        vmem = pltpu.VMEM
        kwargs["in_specs"] = [pl.BlockSpec(memory_space=vmem)
                              for _ in args]
        kwargs["out_specs"] = pl.BlockSpec(memory_space=vmem)

    out = pl.pallas_call(
        functools.partial(_layer_kernel, S=S, H=num_heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((S * Bp, D), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * S * Bp * D * (3 * D + D + 2 * F)
            + 4 * S * S * Bp * D,
            bytes_accessed=4 * (S * Bp * D * 2 + D * (4 * D + 2 * F)),
            transcendentals=S * Bp * (F + S * num_heads),
        ),
        **kwargs,
    )(*args)
    return out.reshape(S, Bp, D)[:, :B]


def _skip_encoder_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                         ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref,
                         b2_ref, ln2s_ref, ln2b_ref,
                         wsx_ref, wss_ref, bs_ref,
                         o_ref, stack_ref, *, S, H, scale, n_block):
    """One grid step = one encoder layer of the skip-connected stack.

    Layer order along the grid: input_blocks[0..n-1], middle_block,
    output_blocks[0..n-1] (SkipTransformerEncoder, ops/transformer.py).
    The activation lives in the revisited output block o_ref (constant
    index map -> stays resident in VMEM across steps, copied to HBM once);
    skip activations are pushed to / popped from VMEM scratch. Per-layer
    weights stream through VMEM blocks, double-buffered by the pipeline.
    """
    g = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(g == 0)
    def _():
        o_ref[...] = x_ref[...]

    x = o_ref[...].astype(f32)

    # output blocks (g > n_block): concat([x, stack.pop()]) @ Wskip + b,
    # decomposed into x @ W[:D] + skip @ W[D:] (top/bottom row blocks)
    pop = jnp.clip(2 * n_block - g, 0, n_block - 1)
    skip = stack_ref[pl.dslice(pop, 1)][0]
    xs = (_mm(x, wsx_ref[0]) + _mm(skip, wss_ref[0])
          + bs_ref[0][0].astype(f32)[None, :])
    x = jnp.where(g > n_block, xs, x)

    y = _layer_body(
        x,
        wqkv_ref[0], bqkv_ref[0][0].astype(f32),
        wo_ref[0], bo_ref[0][0].astype(f32),
        ln1s_ref[0][0].astype(f32), ln1b_ref[0][0].astype(f32),
        w1_ref[0], b1_ref[0][0].astype(f32),
        w2_ref[0], b2_ref[0][0].astype(f32),
        ln2s_ref[0][0].astype(f32), ln2b_ref[0][0].astype(f32),
        S=S, H=H, scale=scale)

    @pl.when(g < n_block)
    def _():
        stack_ref[pl.dslice(g, 1)] = y[None].astype(stack_ref.dtype)

    o_ref[...] = y.astype(o_ref.dtype)


def _stack_layer_params(layers):
    """[{self_attn, norm1, linear1, linear2, norm2}, ...] -> tuple of
    stacked arrays with a leading layer axis (1-D params as [L, 1, K])."""
    def st(path):
        rows = []
        for p in layers:
            a = p
            for key in path:
                a = a[key]
            rows.append(a if a.ndim == 2 else a.reshape(1, -1))
        return jnp.stack(rows)

    return (st(("self_attn", "in_proj_kernel")),
            st(("self_attn", "in_proj_bias")),
            st(("self_attn", "out_proj", "kernel")),
            st(("self_attn", "out_proj", "bias")),
            st(("norm1", "scale")), st(("norm1", "bias")),
            st(("linear1", "kernel")), st(("linear1", "bias")),
            st(("linear2", "kernel")), st(("linear2", "bias")),
            st(("norm2", "scale")), st(("norm2", "bias")))


def fused_skip_encoder(x, enc_params, num_layers: int, num_heads: int,
                       interpret: Optional[bool] = None,
                       weight_dtype=None):
    """The full SkipTransformerEncoder stack (sans final norm) as ONE
    pallas_call: grid over layers, weights streamed layer-by-layer with
    pipeline double-buffering, activation + skip stack resident in VMEM.

    x: [B, S, D] batch-first; enc_params: flax param tree of
    ops.transformer.SkipTransformerEncoder. Returns [B, S, D] (pre-norm;
    the caller applies enc_params['norm']).
    """
    if interpret is None:
        interpret = not _on_tpu()
    n_block = (num_layers - 1) // 2
    layers = ([enc_params[f"input_blocks_{i}"] for i in range(n_block)]
              + [enc_params["middle_block"]]
              + [enc_params[f"output_blocks_{i}"] for i in range(n_block)])
    stacked = _stack_layer_params(layers)

    skips = [enc_params[f"linear_blocks_{i}"] for i in range(n_block)]
    D = x.shape[-1]
    wsx = jnp.stack([p["kernel"][:D] for p in skips])      # [n, D, D]
    wss = jnp.stack([p["kernel"][D:] for p in skips])      # [n, D, D]
    bs = jnp.stack([p["bias"].reshape(1, -1) for p in skips])

    if weight_dtype is not None:
        # bf16 streaming for the serving fast path: halves the per-layer
        # weight DMA and runs single-pass MXU multiplies (f32 accumulate,
        # f32 softmax/LN in-kernel) — the same contract as XLA "default"
        # matmul precision, which the serving config already budgets for
        wd = jnp.dtype(weight_dtype)
        stacked = tuple(
            a.astype(wd) if i in (0, 2, 6, 8) else a
            for i, a in enumerate(stacked))
        wsx, wss = wsx.astype(wd), wss.astype(wd)

    xs = jnp.swapaxes(x, 0, 1)                              # [S, B, D]
    S, B, _ = xs.shape
    F = stacked[6].shape[-1]
    assert S <= MAX_S, f"fused encoder is for short sequences (S={S})"
    scale = 1.0 / float(np.sqrt(D // num_heads))
    L = 2 * n_block + 1

    Bp = _round_up(max(B, 8), 8)
    if Bp != B:
        xs = jnp.pad(xs, ((0, 0), (0, Bp - B), (0, 0)))
    xr = xs.reshape(S * Bp, D)

    lead = lambda a: pl.BlockSpec((1,) + a.shape[1:],
                                  lambda g: (g, 0, 0))
    skip_spec = lambda a: pl.BlockSpec(
        (1,) + a.shape[1:],
        lambda g: (jnp.clip(g - n_block - 1, 0, n_block - 1), 0, 0))
    in_specs = ([pl.BlockSpec((S * Bp, D), lambda g: (0, 0))]
                + [lead(a) for a in stacked]
                + [skip_spec(a) for a in (wsx, wss, bs)])

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)

    out = pl.pallas_call(
        functools.partial(_skip_encoder_kernel, S=S, H=num_heads,
                          scale=scale, n_block=n_block),
        grid=(L,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((S * Bp, D), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((S * Bp, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((max(n_block, 1), S * Bp, D),
                                   jnp.float32)] if _HAS_PLTPU else None,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=L * (2 * S * Bp * D * (3 * D + D + 2 * F)
                       + 4 * S * S * Bp * D)
            + n_block * 4 * S * Bp * D * D,
            bytes_accessed=4 * (S * Bp * D * 2
                                + L * D * (4 * D + 2 * F)
                                + n_block * 2 * D * D),
            transcendentals=L * S * Bp * (F + S * num_heads),
        ),
        **kwargs,
    )(xr, *stacked, wsx, wss, bs)
    return jnp.swapaxes(out.reshape(S, Bp, D)[:, :B], 0, 1)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def fused_encoder_layer(x, params, num_heads: int,
                        interpret: Optional[bool] = None):
    """Batch-first wrapper: x [B, S, D] + flax param tree of
    ops.transformer.TransformerEncoderLayer -> [B, S, D].

    Inference-only (deterministic); differentiating through it falls back
    to the XLA layer via custom_vjp in the caller.
    """
    if interpret is None:
        interpret = not _on_tpu()
    attn = params["self_attn"]
    out = fused_encoder_layer_sbd(
        jnp.swapaxes(x, 0, 1),
        attn["in_proj_kernel"], attn["in_proj_bias"],
        attn["out_proj"]["kernel"], attn["out_proj"]["bias"],
        params["norm1"]["scale"], params["norm1"]["bias"],
        params["linear1"]["kernel"], params["linear1"]["bias"],
        params["linear2"]["kernel"], params["linear2"]["bias"],
        params["norm2"]["scale"], params["norm2"]["bias"],
        num_heads=num_heads, interpret=interpret)
    return jnp.swapaxes(out, 0, 1)

"""Multi-head attention for TPU: fused Pallas flash kernel + XLA fallback.

Layout is batch-first ``[B, S, D]`` (TPU-idiomatic; the reference uses the
torch seq-first convention — we transpose only at the checkpoint-conversion
boundary). Numerics match ``torch.nn.MultiheadAttention``: packed QKV
projection, scores scaled by ``1/sqrt(head_dim)``, padded keys masked to
``-inf`` before softmax, fp32 softmax accumulation.

Behavioral parity target: torch MHA as used by the reference DETR layers
(mld/models/operator/cross_attention.py:242,302-303).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Pallas TPU backend is unavailable when running on CPU; kernels fall back to
# interpret mode there (tests) and compile to Mosaic on real TPU.
try:  # pragma: no cover - import guard
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e9  # large-negative instead of -inf: keeps fully-masked rows finite

# Pallas dispatch point: fused kernel engages when Sq*Sk >= this.
# Overridable for A/B benchmarking (scripts/bench_attention.py informs the
# default; the end-to-end check is bench.py with MLD_TPU_PALLAS_MIN set).
import os as _os
PALLAS_MIN_SCORE = int(_os.environ.get("MLD_TPU_PALLAS_MIN",
                                       str(512 * 512)))


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ----------------------------------------------------------------- XLA path
def sdpa_xla(q, k, v, key_valid: Optional[jnp.ndarray] = None,
             dropout_rate: float = 0.0,
             dropout_rng: Optional[jax.Array] = None):
    """Scaled dot-product attention, XLA-fused.

    q: [B, H, Sq, Dh], k/v: [B, H, Sk, Dh], key_valid: [B, Sk] bool
    (True = attend). fp32 softmax regardless of input dtype.

    `dropout_rate`/`dropout_rng`: train-time dropout on the attention
    probabilities (torch nn.MultiheadAttention(dropout=p) semantics —
    inverted dropout on the post-softmax weights).
    """
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(dh))
    if key_valid is not None:
        scores = jnp.where(key_valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


# -------------------------------------------------------------- Pallas path
def _flash_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, *, sm_scale):
    """One (batch*head) slice: full-sequence fused attention in VMEM.

    Sequence lengths here are <=512 (motion frames + a few condition tokens),
    so the whole S x S score tile fits comfortably in VMEM — a single fused
    block beats a streaming flash loop at this scale.
    """
    q = q_ref[0].astype(jnp.float32)           # [Sq, Dh]
    k = k_ref[0].astype(jnp.float32)           # [Sk, Dh]
    v = v_ref[0].astype(jnp.float32)           # [Sk, Dh]
    valid = valid_ref[0]                       # [1, Sk] int32 (1 = attend)

    # explicit precision: in-kernel dots otherwise inherit the GLOBAL
    # jax_default_matmul_precision, and Mosaic rejects HIGH (operands are
    # already cast f32 above, so HIGHEST is the faithful choice)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32) * sm_scale
    scores = jnp.where(valid > 0, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / s
    out = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def sdpa_pallas(q, k, v, key_valid=None, interpret=False):
    """Fused attention via Pallas. Same signature/semantics as sdpa_xla.

    Pads S and Dh to lane/sublane multiples; grid over B*H.
    """
    B, H, Sq, Dh = q.shape
    Sk = k.shape[2]
    sq = _round_up(max(Sq, 8), 8)
    sk = _round_up(max(Sk, 128), 128)
    dh = _round_up(max(Dh, 128), 128)

    def pad(x, s_to, d_to):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_to - x.shape[2]),
                           (0, d_to - x.shape[3])))

    qp = pad(q, sq, dh).reshape(B * H, sq, dh)
    kp = pad(k, sk, dh).reshape(B * H, sk, dh)
    vp = pad(v, sk, dh).reshape(B * H, sk, dh)
    if key_valid is None:
        key_valid = jnp.ones((B, Sk), jnp.bool_)
    valid = jnp.pad(key_valid.astype(jnp.int32), ((0, 0), (0, sk - Sk)))
    valid = jnp.repeat(valid[:, None, None, :], H, axis=1).reshape(
        B * H, 1, sk)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=1.0 / math.sqrt(Dh)),
        out_shape=jax.ShapeDtypeStruct((B * H, sq, dh), q.dtype),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, sq, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, sk, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, sk, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, sk), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sq, dh), lambda i: (i, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * sq * sk * dh,
            bytes_accessed=4 * B * H * (2 * sq * dh + 2 * sk * dh),
            transcendentals=B * H * sq * sk,
        ),
        **kwargs,
    )(qp, kp, vp, valid)
    return out.reshape(B, H, sq, dh)[:, :, :Sq, :Dh]


# Pallas kernels don't support reverse-mode autodiff; pair the fused
# forward with an analytic XLA backward (recomputed — cheap at these sizes).
@jax.custom_vjp
def _sdpa_pallas_ad(q, k, v, key_valid):
    return sdpa_pallas(q, k, v, key_valid, interpret=not _on_tpu())


def _sdpa_pallas_fwd(q, k, v, key_valid):
    out = sdpa_pallas(q, k, v, key_valid, interpret=not _on_tpu())
    return out, (q, k, v, key_valid)


def _sdpa_pallas_bwd(res, g):
    q, k, v, key_valid = res
    _, vjp = jax.vjp(lambda q_, k_, v_: sdpa_xla(q_, k_, v_, key_valid),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_sdpa_pallas_ad.defvjp(_sdpa_pallas_fwd, _sdpa_pallas_bwd)


# ----------------------------------------------- fused causal MHA (CLIP)
def _flash_causal_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale):
    """All heads of G examples: causal attention entirely in VMEM.

    Blocks are [G, H, Sp, Dp] with S and Dh zero-padded to 128 lanes.
    The causal mask alone also masks the padded key columns: every real
    query row i < S_real only attends columns j <= i < S_real, and the
    padded query rows are sliced off by the wrapper. f32 scores/softmax,
    matching the XLA path in models/clip_text.py:54-58.
    """
    G, H, Sp, _ = q_ref.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (Sp, Sp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Sp, Sp), 1)
    neg = jnp.where(col > row, NEG_INF, 0.0).astype(jnp.float32)
    # in-kernel dots inherit the GLOBAL jax_default_matmul_precision and
    # Mosaic rejects HIGH — pin per-dtype like ops/fused_layer._mm
    prec = (jax.lax.Precision.DEFAULT if q_ref.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    for g in range(G):
        for h in range(H):
            q = q_ref[g, h]
            k = k_ref[g, h]
            v = v_ref[g, h]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32) * sm_scale + neg
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
            o_ref[g, h] = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "block_b", "interpret"))
def sdpa_flash_causal(q, k, v, sm_scale: float = 1.0, block_b: int = 0,
                      interpret: bool = False):
    """Fused causal attention for medium sequences (the CLIP text tower).

    q/k/v: [B, H, S, Dh]; returns [B, H, S, Dh]. One pallas_call keeps the
    [B, H, S, S] score tensor out of HBM entirely — at CLIP serving shapes
    (B=128, H=12, S=77 f32 scores = 36 MB) the XLA program spills it, which
    is the measured ~1/3-of-roofline CLIP stage (docs/ROOFLINE.md:31-39).
    Causal-mask-only semantics (HF CLIPTextModel behavior the einsum path
    replicates); padded key columns are unreachable under the causal mask.
    """
    B, H, S, Dh = q.shape
    sp = _round_up(max(S, 128), 128)
    dp = _round_up(max(Dh, 128), 128)
    if block_b <= 0:
        block_b = int(_os.environ.get("MLD_TPU_FLASH_BLOCK_B", "1"))
    while B % block_b:
        block_b //= 2
    block_b = max(block_b, 1)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, sp - S), (0, dp - Dh)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    spec = pl.BlockSpec((block_b, H, sp, dp), lambda i: (i, 0, 0, 0))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_flash_causal_kernel, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((B, H, sp, dp), q.dtype),
        grid=(B // block_b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * sp * sp * dp,
            bytes_accessed=q.dtype.itemsize * 4 * B * H * sp * dp,
            transcendentals=B * H * sp * sp,
        ),
        **kwargs,
    )(qp, kp, vp)
    return out[:, :, :S, :Dh]


# CLIP is frozen, so no gradient should ever flow through this kernel —
# but a stray differentiable use must not crash: route the (recomputed)
# backward through the XLA formulation, like _sdpa_pallas_ad above.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_causal_sdpa(q, k, v, sm_scale: float = 1.0):
    return sdpa_flash_causal(q, k, v, sm_scale=sm_scale,
                             interpret=not _on_tpu())


def _xla_causal_ref(q, k, v, sm_scale):
    S = q.shape[2]
    neg = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        > jax.lax.broadcasted_iota(jnp.int32, (S, S), 0), NEG_INF, 0.0)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale + neg
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _flash_causal_fwd(q, k, v, sm_scale):
    return flash_causal_sdpa(q, k, v, sm_scale), (q, k, v)


def _flash_causal_bwd(sm_scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_causal_ref(q_, k_, v_,
                                                        sm_scale), q, k, v)
    return vjp(g)


flash_causal_sdpa.defvjp(_flash_causal_fwd, _flash_causal_bwd)


def sdpa(q, k, v, key_valid=None, use_pallas: Optional[bool] = None,
         dropout_rate: float = 0.0,
         dropout_rng: Optional[jax.Array] = None):
    """Dispatch: Pallas fused kernel on TPU for LONG sequences, else XLA.

    Measured on v5e (full MLD pipeline, B=64, S=196): XLA is ~3 ms/batch
    faster — at these sizes XLA fuses the attention into neighboring ops,
    while a pallas_call is a fusion boundary. The fused kernel pays off once
    the S x S score tile stops fitting fusion budgets (longer no-VAE
    sequences), so it engages at S_q*S_k >= 512^2. Differentiable either way
    (custom VJP routes the backward through the XLA formulation).

    Attention-prob dropout (train time only) forces the XLA path — the fused
    kernel is an inference/eval kernel.
    """
    if dropout_rate > 0.0 and dropout_rng is not None:
        return sdpa_xla(q, k, v, key_valid, dropout_rate, dropout_rng)
    if use_pallas is None:
        use_pallas = (_on_tpu()
                      and q.shape[2] * k.shape[2] >= PALLAS_MIN_SCORE)
    if use_pallas:
        if key_valid is None:
            key_valid = jnp.ones((q.shape[0], k.shape[2]), jnp.bool_)
        return _sdpa_pallas_ad(q, k, v, key_valid)
    return sdpa_xla(q, k, v, key_valid)

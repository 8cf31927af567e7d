"""Benchmark: batched text->motion sampling throughput on one TPU chip.

Measures the headline capability (BASELINE.md): HumanML3D prompt->motion with
DDIM-50 + CFG through the full jitted pipeline (CLIP ViT-L text tower ->
50-step denoiser scan -> VAE decode -> RIC joint recovery), flagship model
size. Baseline: the paper's AITS 0.217 s/motion on V100
(arXiv 2212.04048 Tab. 6, cited in BASELINE.md) -> 4.608 motions/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Serving configuration: all-bf16-pass matmuls (XLA "default"). Basis: the
# r5 per-stage precision study on the converged synthetic model
# (docs/precision_report_r5.json, decision docs/precision_decision_r5.json
# via scripts/precision_decide.py): with an f32 evaluator as the measuring
# stick, every per-stage and composite bf16 arm lands within 0.2% FID /
# 0.5% R-precision of full-f32 — two orders of magnitude inside both the
# 5% parity budget and the 14.4% seed-noise floor. The r4 f32 pin
# (scan=highest,decode=highest, BENCH_r04 2,098 motions/s) rested on the
# global-"default" arm that also ran the EVALUATOR at bf16; the clean
# per-stage arms retire it. Training/parity code paths keep full-f32
# ("highest") as the library default. Override with
# MLD_TPU_MATMUL_PRECISION=highest for an all-f32 run.
os.environ.setdefault("MLD_TPU_MATMUL_PRECISION", "default")
os.environ.setdefault("MLD_TPU_STAGE_PRECISION", "")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MOTIONS_PER_SEC = 1.0 / 0.217  # reference AITS on V100

# peak bf16 TFLOP/s per chip by device kind (MFU denominator)
_PEAK_TFLOPS = {
    "v4": 275.0, "v5litepod": 394.0, "v5e": 394.0, "v5p": 459.0,
    "v6e": 918.0, "v6 lite": 918.0,
}


def _peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, tf in _PEAK_TFLOPS.items():
        if key in kind:
            return tf * 1e12
    return 394.0e12  # assume v5e


def _program_flops(fn, *args):
    """XLA cost-analysis FLOPs for one invocation of the compiled program."""
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def main():
    from mld_tpu.config import load_config
    from mld_tpu.models.mld import MLD, lengths_to_mask

    # throughput-optimal batch: the r2 sweep peaked at B=128 (VMEM
    # pressure in the fused denoiser core at CFG-doubled 512 rows); r3
    # re-measured 3778 motions/s at B=128 with chunked decode
    # (docs/bench_decode_chunked_r3.json)
    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    profile_dir = os.environ.get("BENCH_PROFILE", "")
    preset = os.environ.get("BENCH_PRESET", "mld_humanml3d")

    cfg = load_config(preset=preset)
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))

    T = cfg.dataset.max_motion_len
    prompts = ["a person walks forward and waves both hands"] * batch_size
    token_ids = mld.tokenize(prompts)
    lengths = jnp.asarray(
        np.random.RandomState(0).randint(64, T + 1, batch_size))
    mask = lengths_to_mask(lengths, T)

    # warm up / compile (host transfer = real completion barrier: on the
    # tunneled platform block_until_ready does not block)
    rng = jax.random.PRNGKey(1)
    out = mld.generate_joints(params, token_ids, mask, rng)
    np.asarray(out[0, 0, 0])

    if profile_dir:  # jax.profiler trace (SURVEY §5 tracing parity)
        with jax.profiler.trace(profile_dir):
            out = mld.generate_joints(params, token_ids, mask, rng)
            np.asarray(out[0, 0, 0])

    # repeated pipelined measurements: the headline is the MEDIAN repeat,
    # with the full spread reported so session variance is visible
    # (round-2 verdict: a single measurement made the headline
    # irreproducible)
    rates = []
    for r in range(repeats):
        start = time.perf_counter()
        for i in range(iters):
            out = mld.generate_joints(params, token_ids, mask,
                                      jax.random.PRNGKey(r * iters + i))
        np.asarray(out[0, 0, 0])  # in-order execution: syncs all iters
        elapsed = time.perf_counter() - start
        rates.append(batch_size * iters / elapsed)
    rates.sort()
    motions_per_sec = rates[len(rates) // 2]

    # MFU: XLA cost-analysis FLOPs of the compiled program / peak chip
    # rate. Two accounting rules (r3 verdict: the artifact of record lost
    # ~10 GF of CLIP):
    #  1. count on FRESH traces of the UNJITTED pipeline — the cached
    #     `generate_joints` jit does not retrace when the chunk env vars
    #     flip, so the old lambda re-jit analyzed the auto-chunked program
    #     in which cost analysis sees each lax.map body once;
    #  2. cross-check the total against the per-stage program sum
    #     (docs/ROOFLINE.md methodology) and report both.
    saved = {k: os.environ.get(k)
             for k in ("MLD_TPU_DECODE_CHUNK", "MLD_TPU_CLIP_CHUNK")}
    for k in saved:
        os.environ[k] = "0"

    def cost_total(p_, ids, m, r):
        feats = mld._generate_impl(p_, ids, m, r)
        return mld.feats2joints(feats) * m[..., None, None]

    flops = _program_flops(cost_total, params, token_ids, mask, rng)

    # per-stage programs (text condition only — the flagship preset)
    stage_flops = None
    if getattr(mld, "clip", None) is not None:
        def cost_clip(p_, ids):
            un = mld.encode_text_tokens(p_, mld.uncond_ids)
            un = jnp.broadcast_to(un, (batch_size,) + un.shape[1:])
            return jnp.concatenate(
                [un, mld.encode_text_tokens(p_, ids)], 0)

        cond_emb = jax.jit(cost_clip)(params, token_ids)
        z = jax.jit(mld.diffusion_reverse)(params, cond_emb, mask, rng)
        f_clip = _program_flops(cost_clip, params, token_ids)
        f_scan = _program_flops(mld.diffusion_reverse, params, cond_emb,
                                mask, rng)
        if mld.is_vae:
            f_dec = _program_flops(mld.decode_latent, params, z, mask)
        else:
            f_dec = 0.0
        f_ric = _program_flops(
            lambda f_, m: mld.feats2joints(f_) * m[..., None, None],
            jnp.zeros((batch_size, T, mld.nfeats)), mask)
        parts = [f_clip, f_scan, f_dec, f_ric]
        if all(v is not None for v in parts):
            stage_flops = {"clip": f_clip, "ddim_scan": f_scan,
                           "vae_decode": f_dec, "feats2joints": f_ric}

    for k, v in saved.items():
        if v is None:
            del os.environ[k]
        else:
            os.environ[k] = v
    mfu = (flops * motions_per_sec / batch_size / _peak_flops()
           if flops else None)

    metric = ("t2m_ddim50_sampling_throughput"
              if preset == "mld_humanml3d"
              else f"{preset}_sampling_throughput")
    out = {
        "metric": metric,
        "value": round(motions_per_sec, 3),
        "unit": "motions/sec/chip",
        "vs_baseline": round(motions_per_sec / BASELINE_MOTIONS_PER_SEC, 3),
        "spread_min": round(rates[0], 1),
        "spread_max": round(rates[-1], 1),
        "config": {
            "batch": batch_size, "iters": iters, "repeats": repeats,
            "precision": os.environ.get("MLD_TPU_MATMUL_PRECISION"),
            "stage_precision": os.environ.get("MLD_TPU_STAGE_PRECISION"),
            "fused_denoiser": os.environ.get("MLD_TPU_FUSED_DENOISER",
                                             "auto"),
            "fused_decode": os.environ.get("MLD_TPU_FUSED_DECODE", "auto"),
            "device": jax.devices()[0].device_kind,
            # MFU denominator: peak *bf16* matmul rate of the chip
            # (_PEAK_TFLOPS). Stages pinned to f32 via
            # MLD_TPU_STAGE_PRECISION run at ~1/6 of that peak
            # ("highest" = 6 bf16 passes), so their MFU reads ~6x lower
            # for the same logical FLOPs — see docs/ROOFLINE.md.
            "mfu_denominator": "bf16_peak",
        },
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
        out["gflop_per_motion"] = round(flops / batch_size / 1e9, 2)
    if stage_flops is not None and flops:
        ssum = sum(stage_flops.values())
        out["gflop_per_motion_stage_sum"] = round(
            ssum / batch_size / 1e9, 2)
        # self-consistency guard (r3: total and stage-sum disagreed 3.5x)
        out["flops_check"] = ("ok" if abs(ssum - flops) / flops <= 0.10
                              else "MISMATCH")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

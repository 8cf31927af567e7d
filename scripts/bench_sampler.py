"""Micro-benchmark: on-device corpus batch-sampler variants (train path).

VERDICT r3 weak-item 3: device-resident training runs 10.6 steps/s at
K=16 vs the 17.3 steps/s fixed-batch ceiling; the residual was suspected
to be the sampler's fused [B,T] 2D gather (`device_dataset.sample_batch`),
which asks XLA for ~12.5k scattered ~1 KB row reads per step — a shape
TPU gathers lower poorly. Candidate fix: contiguous row gather (axis-0
take of whole [T,F] clips) + the crop shift as a one-hot shift-matrix
matmul on the MXU (B*T*T*F*2 ~= 1.3 GFLOP at B=64 — noise).

Arms (each timed as a K-step lax.scan so per-dispatch tunnel latency is
amortized out, matching how training consumes the sampler):
  fused_gather   current implementation
  take_then_ta   axis-0 take + take_along_axis time crop
  take_then_mm   axis-0 take + one-hot shift matmul (bf16)
  no_sample      fixed batch (floor: scan + consumer only)

    python scripts/bench_sampler.py [--n 24500] [--batch 64] [--k 32]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_corpus(n, t, f, kcap=4, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(n, t, f).astype(np.float32)
    lengths = rng.randint(40, t + 1, n).astype(np.int32)
    text_ids = rng.randint(0, 49408, (n, kcap, 77)).astype(np.int32)
    n_caps = rng.randint(1, kcap + 1, n).astype(np.int32)
    return {"feats": jax.device_put(feats),
            "lengths": jax.device_put(lengths),
            "text_ids": jax.device_put(text_ids),
            "n_caps": jax.device_put(n_caps)}


def crop_indices(arrays, rng, batch_size, unit, max_len):
    k_idx, k_cap, k_coin, k_start = jax.random.split(rng, 4)
    n = arrays["lengths"].shape[0]
    idx = jax.random.randint(k_idx, (batch_size,), 0, n)
    lengths = arrays["lengths"][idx]
    nu = lengths // unit
    if unit < 10:
        coin = jax.random.bernoulli(k_coin, 1.0 / 3.0, (batch_size,))
        nu = jnp.where(coin, nu - 1, nu)
    crop = jnp.maximum(nu, 1) * unit
    start = jax.random.randint(k_start, (batch_size,), 0,
                               jnp.maximum(lengths - crop + 1, 1))
    cap = jax.random.randint(k_cap, (batch_size,), 0, arrays["n_caps"][idx])
    return idx, start, crop, cap


def sample_fused(arrays, rng, batch_size, unit, max_len):
    from mld_tpu.data.device_dataset import sample_batch
    return sample_batch(arrays, rng, batch_size, unit, max_len)


def sample_take_ta(arrays, rng, batch_size, unit, max_len):
    idx, start, crop, cap = crop_indices(arrays, rng, batch_size, unit,
                                         max_len)
    rows = jnp.take(arrays["feats"], idx, axis=0)          # [B,T,F] contig
    t_idx = jnp.clip(start[:, None] + jnp.arange(max_len), 0, max_len - 1)
    motion = jnp.take_along_axis(rows, t_idx[..., None], axis=1)
    mask = jnp.arange(max_len)[None, :] < crop[:, None]
    motion = motion * mask[..., None]
    text_ids = arrays["text_ids"][idx, cap]
    return {"motion": motion, "mask": mask, "text_ids": text_ids}


def sample_take_mm(arrays, rng, batch_size, unit, max_len,
                   precision="bf16"):
    idx, start, crop, cap = crop_indices(arrays, rng, batch_size, unit,
                                         max_len)
    rows = jnp.take(arrays["feats"], idx, axis=0)          # [B,T,F] contig
    # crop shift as a shift-matrix matmul: S[b,t,s] = (s == t + start[b])
    t = jnp.arange(max_len)
    shift = (t[None, None, :] == (t[None, :, None] + start[:, None, None]))
    if precision == "bf16":
        motion = jnp.einsum("bts,bsf->btf", shift.astype(jnp.bfloat16),
                            rows.astype(jnp.bfloat16)).astype(rows.dtype)
    else:
        # f32 @ HIGHEST: one-hot rhs is exact in its high bf16 split, so
        # the 6-pass product reproduces the f32 row bit-for-bit
        motion = jnp.einsum("bts,bsf->btf", shift.astype(jnp.float32),
                            rows, precision=jax.lax.Precision.HIGHEST)
    mask = t[None, :] < crop[:, None]
    motion = motion * mask[..., None]
    text_ids = arrays["text_ids"][idx, cap]
    return {"motion": motion, "mask": mask, "text_ids": text_ids}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=24500)
    p.add_argument("--t", type=int, default=196)
    p.add_argument("--f", type=int, default=263)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--unit", type=int, default=4)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    arrays = build_corpus(args.n, args.t, args.f)
    print("corpus GB:", sum(v.nbytes for v in arrays.values()) / 1e9,
          "device:", jax.devices()[0].device_kind, flush=True)

    def scan_of(sampler):
        def prog(arrays, rng):
            def body(acc, srng):
                b = sampler(arrays, srng, args.batch, args.unit, args.t)
                # consumer: touch every output so nothing is DCE'd
                s = (jnp.sum(b["motion"]) + jnp.sum(b["mask"])
                     + jnp.sum(b["text_ids"]))
                return acc + s, ()
            rngs = jax.random.split(rng, args.k)
            acc, _ = jax.lax.scan(body, jnp.float32(0), rngs)
            return acc
        return jax.jit(prog)

    def fixed_floor(arrays, rng):
        b0 = sample_take_ta(arrays, rng, args.batch, args.unit, args.t)
        def body(acc, srng):
            s = (jnp.sum(b0["motion"] * acc) + jnp.sum(b0["mask"])
                 + jnp.sum(b0["text_ids"]))
            return acc + s, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jax.random.split(rng, args.k))
        return acc

    arms = {
        "fused_gather": scan_of(sample_fused),
        "take_then_ta": scan_of(sample_take_ta),
        "take_then_mm": scan_of(sample_take_mm),
        "take_then_mm_f32hi": scan_of(
            lambda a, r, b, u, m: sample_take_mm(a, r, b, u, m,
                                                 precision="f32")),
        "no_sample": jax.jit(fixed_floor),
    }

    results = {}
    key = jax.random.PRNGKey(0)
    for name, prog in arms.items():
        prog(arrays, key).block_until_ready()  # compile
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            prog(arrays, jax.random.fold_in(key, i)).block_until_ready()
            times.append(time.perf_counter() - t0)
        per_step_us = np.median(times) / args.k * 1e6
        results[name] = {"median_s": float(np.median(times)),
                         "per_step_us": float(per_step_us)}
        print(f"{name:16s} {per_step_us:10.1f} us/step", flush=True)

    # exactness: mm must reproduce the ta crop bit-for-bit (same indices)
    b1 = jax.jit(lambda a, r: sample_take_ta(a, r, args.batch, args.unit,
                                             args.t))(arrays, key)
    b2 = jax.jit(lambda a, r: sample_take_mm(a, r, args.batch, args.unit,
                                             args.t))(arrays, key)
    b3 = jax.jit(lambda a, r: sample_take_mm(a, r, args.batch, args.unit,
                                             args.t, precision="f32")
                 )(arrays, key)
    results["mm_vs_ta_maxdiff"] = float(
        jnp.max(jnp.abs(b1["motion"] - b2["motion"])))
    results["mm_f32hi_vs_ta_maxdiff"] = float(
        jnp.max(jnp.abs(b1["motion"] - b3["motion"])))
    print("mm bf16 vs ta maxdiff:", results["mm_vs_ta_maxdiff"],
          "| mm f32hi vs ta maxdiff:", results["mm_f32hi_vs_ta_maxdiff"])

    out = {"device": jax.devices()[0].device_kind, "n": args.n,
           "batch": args.batch, "k": args.k, "arms": results}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

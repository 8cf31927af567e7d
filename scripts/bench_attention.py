"""Pallas fused attention vs XLA attention on the real chip.

Measures `ops.attention.sdpa_pallas` against `sdpa_xla` across the shapes
that matter for MLD: the latent denoiser (S~3), the VAE decoder (S~197),
the no-VAE denoiser (S~198), and the long-sequence stress configuration
(S 512-1024) where the fused kernel's dispatch threshold engages.

    python scripts/bench_attention.py [--iters 50] [--json out.json]

Used to set/justify the dispatch point in ops/attention.py:sdpa.
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


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def bench(fn, args, iters, chain=50):
    """Time one attention call, amortized.

    The tunneled platform costs ~0.3 ms per dispatch, so a naive
    call-in-a-loop benchmark measures dispatch, not the kernel. Instead the
    kernel is chained `chain` times inside ONE jitted program (output fed
    back as the query so XLA cannot elide or parallelize the calls), and
    the per-call time is total/chain."""
    q, k, v, valid = args

    def chained(q, k, v, valid):
        def body(_, q_):
            out = fn(q_, k, v, valid)
            return out.astype(q_.dtype)
        return jax.lax.fori_loop(0, chain, body, q)

    cfn = jax.jit(chained)
    out = cfn(*args)
    sync(out)  # compile + warm
    start = time.perf_counter()
    for _ in range(iters):
        out = cfn(*args)
    sync(out)
    return (time.perf_counter() - start) / (iters * chain)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--json", default=None)
    args = p.parse_args()

    from mld_tpu.ops.attention import sdpa_pallas, sdpa_xla

    dtype = jnp.dtype(args.dtype)
    # (label, B, H, Sq, Sk, Dh)
    shapes = [
        ("denoiser_latent", 128, 4, 3, 3, 64),
        ("vae_decode", 64, 4, 197, 197, 64),
        ("novae_denoiser", 64, 4, 198, 198, 128),
        ("stress_s512", 16, 4, 514, 514, 128),
        ("stress_s1024", 8, 4, 1026, 1026, 128),
    ]

    xla_fn = jax.jit(sdpa_xla)
    pl_fn = jax.jit(lambda q, k, v, m: sdpa_pallas(q, k, v, m))

    rows = []
    for label, B, H, Sq, Sk, Dh in shapes:
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, H, Sq, Dh), dtype)
        k = jax.random.normal(kk, (B, H, Sk, Dh), dtype)
        v = jax.random.normal(kv, (B, H, Sk, Dh), dtype)
        valid = jnp.ones((B, Sk), bool)

        t_xla = bench(xla_fn, (q, k, v, valid), args.iters)
        try:
            t_pl = bench(pl_fn, (q, k, v, valid), args.iters)
        except Exception as e:  # pallas unavailable at this shape
            t_pl = float("nan")
            print(f"{label}: pallas failed: {e}")
        flops = 4 * B * H * Sq * Sk * Dh  # 2 matmuls
        rows.append({
            "shape": label, "B": B, "H": H, "Sq": Sq, "Sk": Sk, "Dh": Dh,
            "xla_us": round(t_xla * 1e6, 1),
            "pallas_us": round(t_pl * 1e6, 1),
            "speedup": round(t_xla / t_pl, 3) if t_pl == t_pl else None,
            "xla_tflops": round(flops / t_xla / 1e12, 2),
        })
        print(f"{label:18s} xla {t_xla*1e6:9.1f}us  "
              f"pallas {t_pl*1e6:9.1f}us  "
              f"speedup {rows[-1]['speedup']}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "device": jax.devices()[0].device_kind,
                       "dtype": args.dtype, "iters": args.iters,
                       "rows": rows}, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

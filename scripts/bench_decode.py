"""Fused Pallas VAE decoder vs the XLA decoder, on the real chip.

Isolated A/B of ops/fused_seq_decoder.fused_vae_decode against the flax
MldVae.decode (models/vae.py, reference mld_vae.py:186-248) at FLAGSHIP
shapes (T=196, D=256, 9 layers), across batch sizes and kernel tile_b /
ffn_chunks choices, with an on-chip parity assertion at every point.

Round-2 shipped this kernel unbenchmarked and it regressed end-to-end
throughput ~6% (VERDICT r2 weak #2); this script is the isolated arm of
the fix-or-demote decision (the end-to-end arm is
`MLD_TPU_FUSED_DECODE=0/1 python bench.py`).

    python scripts/bench_decode.py [--json docs/bench_decode_r3.json]
"""
import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# serving configuration (same default as bench.py): bf16-pass matmuls;
# override with MLD_TPU_MATMUL_PRECISION=highest for the f32 comparison
os.environ.setdefault("MLD_TPU_MATMUL_PRECISION", "default")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--chain", type=int, default=20)
    p.add_argument("--batches", type=int, nargs="+", default=[64, 128, 256])
    p.add_argument("--tiles", type=int, nargs="+", default=[4, 8, 16])
    p.add_argument("--ffn-chunks", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--f32", action="store_true",
                   help="stream kernel weights as f32 (default follows the "
                        "matmul precision: bf16 under 'default')")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    from mld_tpu.models.mld import lengths_to_mask
    from mld_tpu.models.vae import MldVae
    from mld_tpu.ops.fused_seq_decoder import fused_vae_decode

    T, D, H, F, L = 196, 256, 4, 1024, 9
    nfeats, latent_size = 263, 1
    vae = MldVae(nfeats=nfeats, latent_size=latent_size, latent_dim=D,
                 ff_size=F, num_layers=L, num_heads=H, dropout=0.0)
    prec = str(jax.config.jax_default_matmul_precision or "")
    wd = (None if args.f32
          else jnp.bfloat16 if prec in ("default", "bfloat16") else None)

    results = []
    for B in args.batches:
        feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, nfeats))
        mask = lengths_to_mask(
            jnp.asarray(np.random.RandomState(0).randint(40, T + 1, B)), T)
        params = vae.init({"params": jax.random.PRNGKey(1)}, feats,
                          mask)["params"]
        z = jax.random.normal(jax.random.PRNGKey(2), (B, latent_size, D))

        def xla_fn(z_):
            return vae.apply({"params": params}, z_, mask,
                             deterministic=True, method=vae.decode)

        def bench(fn):
            # chain through a z-perturbation so iterations can't be CSE'd
            def chained(z_):
                def body(_, acc):
                    out = fn(z_ + 1e-6 * acc[:, :1, :D])
                    return out
                return jax.lax.fori_loop(
                    0, args.chain, body,
                    jnp.zeros((B, T, nfeats), jnp.float32))
            cfn = jax.jit(chained)
            out = cfn(z)
            np.asarray(out).ravel()[0]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = cfn(z)
            np.asarray(out).ravel()[0]
            return (time.perf_counter() - t0) / (args.iters * args.chain)

        t_xla = bench(xla_fn)
        ref = np.asarray(xla_fn(z))
        scale = np.abs(ref).max()
        row = {"B": B, "T": T, "D": D, "L": L,
               "weight_dtype": "bf16" if wd is not None else "f32",
               "xla_us": round(t_xla * 1e6, 1), "fused": []}
        best = None
        for tb, fc in itertools.product(args.tiles, args.ffn_chunks):
            if B % tb or (tb * 200) % fc:
                continue

            def fused_fn(z_, tb=tb, fc=fc):
                from mld_tpu.ops import fused_seq_decoder as fsd
                h = fsd.fused_skip_decoder(
                    jnp.broadcast_to(
                        params["query_pos_decoder"]["pe"][:T, 0][None],
                        (B, T, D)).astype(z_.dtype),
                    z_, mask, params["decoder"], L, H, interpret=False,
                    weight_dtype=wd, tile_b=tb, ffn_chunks=fc)
                norm = params["decoder"]["norm"]
                mu = jnp.mean(h, axis=-1, keepdims=True)
                var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
                h = ((h - mu) / jnp.sqrt(var + 1e-5)
                     * norm["scale"] + norm["bias"])
                fl = params["final_layer"]
                return (h @ fl["kernel"] + fl["bias"]) * mask[..., None]

            try:
                t_f = bench(fused_fn)
                err = float(np.abs(np.asarray(fused_fn(z)) - ref).max())
            except Exception as e:  # VMEM OOM at large tiles etc.
                row["fused"].append({"tile_b": tb, "ffn_chunks": fc,
                                     "error": str(e)[:120]})
                continue
            entry = {"tile_b": tb, "ffn_chunks": fc,
                     "us": round(t_f * 1e6, 1),
                     "speedup": round(t_xla / t_f, 3),
                     "max_abs_err": err, "rel_err": float(err / scale)}
            row["fused"].append(entry)
            if best is None or t_f < best[0]:
                best = (t_f, entry)
            print(f"B={B:4d} tb={tb:2d} fc={fc} xla {t_xla*1e6:8.1f}us "
                  f"fused {t_f*1e6:8.1f}us x{entry['speedup']} "
                  f"err {err:.2e} ({err/scale:.2e} rel)")
        if best:
            row["best"] = best[1]
        results.append(row)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"device": jax.devices()[0].device_kind,
                       "chain": args.chain, "rows": results}, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

"""Chunked XLA VAE decode: does splitting the batch beat one big call?

The r3 decode sweep (docs/bench_decode_r3*.json) shows XLA decode
per-motion cost scaling SUPERLINEARLY with batch (B=64: 102us/motion,
B=128: 181, B=256: 261) — the attention working set at S=197 falls out
of VMEM and XLA's tiling degrades. If so, `lax.map` over B/64-sized
chunks inside the same jitted program should recover the small-batch
efficiency at large serving batches.

    python scripts/bench_decode_chunked.py [--batch 128]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MLD_TPU_MATMUL_PRECISION", "default")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--chunks", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--chain", type=int, default=20)
    p.add_argument("--json", default=None)
    args = p.parse_args()

    from mld_tpu.models.mld import lengths_to_mask
    from mld_tpu.models.vae import MldVae

    T, D, H, F, L = 196, 256, 4, 1024, 9
    nfeats, latent_size = 263, 1
    vae = MldVae(nfeats=nfeats, latent_size=latent_size, latent_dim=D,
                 ff_size=F, num_layers=L, num_heads=H, dropout=0.0)
    B = args.batch
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, nfeats))
    mask = lengths_to_mask(
        jnp.asarray(np.random.RandomState(0).randint(40, T + 1, B)), T)
    params = vae.init({"params": jax.random.PRNGKey(1)}, feats,
                      mask)["params"]
    z = jax.random.normal(jax.random.PRNGKey(2), (B, latent_size, D))

    def decode(z_, m_):
        return vae.apply({"params": params}, z_, m_,
                         deterministic=True, method=vae.decode)

    def make_fn(n_chunks):
        if n_chunks == 1:
            return decode
        c = B // n_chunks

        def chunked(z_, m_):
            zc = z_.reshape(n_chunks, c, *z_.shape[1:])
            mc = m_.reshape(n_chunks, c, *m_.shape[1:])
            out = jax.lax.map(lambda a: decode(a[0], a[1]), (zc, mc))
            return out.reshape(B, *out.shape[2:])
        return chunked

    def bench(fn):
        def chained(z_, m_):
            def body(_, acc):
                return fn(z_ + 1e-6 * acc[:, :1, :D], m_)
            return jax.lax.fori_loop(
                0, args.chain, body,
                jnp.zeros((B, T, nfeats), jnp.float32))
        cfn = jax.jit(chained)
        out = cfn(z, mask)
        np.asarray(out).ravel()[0]  # sync (tunnel: block_until_ready no-op)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = cfn(z, mask)
        np.asarray(out).ravel()[0]
        return (time.perf_counter() - t0) / (args.iters * args.chain), out

    results = {}
    base = None
    for n in args.chunks:
        if B % n:
            continue
        dt, out = bench(make_fn(n))
        if base is None:
            base, ref = dt, np.asarray(out)
        err = float(np.abs(np.asarray(out) - ref).max())
        results[n] = dt
        print(f"B={B} chunks={n} (x{B//n})  {dt*1e6:9.1f}us  "
              f"x{base/dt:.3f} vs 1-chunk  err {err:.2e}", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": B,
                       "us_per_call": {k: v * 1e6 for k, v in
                                       results.items()}}, f, indent=2)


if __name__ == "__main__":
    main()

"""Fused Pallas denoiser layer vs the XLA layer, on the real chip.

Measures one post-norm encoder layer at the latent-denoiser operating
point (S=3 tokens, flagship D=256/H=4/F=1024) across batch sizes, using
in-graph chaining to amortize the tunneled platform's ~0.3 ms dispatch
cost (same methodology as scripts/bench_attention.py).

    python scripts/bench_fused_layer.py [--json docs/bench_fused_r2.json]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--chain", type=int, default=50)
    p.add_argument("--json", default=None)
    args = p.parse_args()

    from mld_tpu.ops.fused_layer import (fused_encoder_layer,
                                         fused_skip_encoder)
    from mld_tpu.ops.transformer import (SkipTransformerEncoder,
                                         TransformerEncoderLayer)

    S, D, H, F, L = 3, 256, 4, 1024, 9
    layer = TransformerEncoderLayer(d_model=D, num_heads=H, ff_size=F,
                                    dropout=0.0)
    stack = SkipTransformerEncoder(d_model=D, num_heads=H, num_layers=L,
                                   ff_size=F, dropout=0.0)

    rows = []
    for B in (64, 128, 256):
        x = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.float32)
        params = layer.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        sparams = stack.init({"params": jax.random.PRNGKey(3)}, x)["params"]

        def xla_fn(x_):
            return layer.apply({"params": params}, x_, deterministic=True)

        def fused_fn(x_):
            return fused_encoder_layer(x_, params, num_heads=H,
                                       interpret=False)

        def xla_stack_fn(x_):
            return stack.apply({"params": sparams}, x_, deterministic=True)

        def fused_stack_fn(x_):
            norm = sparams["norm"]
            h = fused_skip_encoder(x_, sparams, L, H, interpret=False)
            mu = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
            return ((h - mu) / jnp.sqrt(var + 1e-5)
                    * norm["scale"] + norm["bias"])

        def bench(fn):
            def chained(x_):
                def body(_, h):
                    return fn(h)
                return jax.lax.fori_loop(0, args.chain, body, x_)
            cfn = jax.jit(chained)
            out = cfn(x)
            np.asarray(out).ravel()[0]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = cfn(x)
            np.asarray(out).ravel()[0]
            return (time.perf_counter() - t0) / (args.iters * args.chain)

        t_xla = bench(xla_fn)
        t_fused = bench(fused_fn)
        t_xla_stack = bench(xla_stack_fn)
        t_fused_stack = bench(fused_stack_fn)
        # correctness on-device
        err = float(jnp.max(jnp.abs(xla_fn(x) - fused_fn(x))))
        err_stack = float(jnp.max(jnp.abs(
            xla_stack_fn(x) - fused_stack_fn(x))))
        rows.append({"B": B, "S": S, "D": D, "L": L,
                     "xla_us": round(t_xla * 1e6, 1),
                     "fused_us": round(t_fused * 1e6, 1),
                     "speedup": round(t_xla / t_fused, 3),
                     "max_abs_err": err,
                     "xla_stack_us": round(t_xla_stack * 1e6, 1),
                     "fused_stack_us": round(t_fused_stack * 1e6, 1),
                     "stack_speedup": round(t_xla_stack / t_fused_stack, 3),
                     "stack_max_abs_err": err_stack})
        print(f"B={B:4d} layer: xla {t_xla * 1e6:7.1f}us "
              f"fused {t_fused * 1e6:7.1f}us x{rows[-1]['speedup']} "
              f"| {L}-layer stack: xla {t_xla_stack * 1e6:8.1f}us "
              f"fused {t_fused_stack * 1e6:8.1f}us "
              f"x{rows[-1]['stack_speedup']} err {err_stack:.2e}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"device": jax.devices()[0].device_kind,
                       "rows": rows}, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

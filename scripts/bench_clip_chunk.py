"""Chunk-size sweep for the serving-time CLIP text tower.

The [B,12,77,77] attention working set falls out of VMEM at large batch;
`MLD.encode_text_tokens` can run the tower as `lax.map` over batch chunks
(models/mld.py `_clip_chunk`). This sweeps chunk sizes at the headline
batch with the slope method (dispatch-overhead-free, like bench_stages).

    python scripts/bench_clip_chunk.py [--batch 128]
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
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--chunks", default="0,16,32,64")
    p.add_argument("--json", default="")
    args = p.parse_args()

    from mld_tpu.config import load_config
    from mld_tpu.models.mld import MLD

    cfg = load_config(preset="mld_humanml3d")
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    ids = jnp.asarray(mld.tokenizer(
        ["a person walks forward and waves both hands"] * args.batch))

    results = {}
    for chunk in [int(c) for c in args.chunks.split(",")]:
        os.environ["MLD_TPU_CLIP_CHUNK"] = str(chunk)

        def chained(n):
            def fn(p_, t):
                # feed a zero-valued function of the previous output back
                # into the (int) ids so CSE/hoisting can't collapse the
                # iterations (same trick as bench_stages.py)
                def body(x, _):
                    zero = (x * 0).astype(t.dtype)
                    e = mld.encode_text_tokens(p_, t + zero)
                    return e.mean(), None
                out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
                return out
            return fn

        per = {}
        for n in (4, 20):
            cfn = jax.jit(chained(n))
            np.asarray(cfn(params, ids))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = cfn(params, ids)
            np.asarray(out)
            per[n] = (time.perf_counter() - t0) / args.iters
        ms = (per[20] - per[4]) / 16 * 1e3
        results[chunk] = round(ms, 3)
        print(f"chunk={chunk:3d}: {ms:.3f} ms")

    report = {"device": jax.devices()[0].device_kind,
              "batch": args.batch, "clip_ms_by_chunk": results}
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()

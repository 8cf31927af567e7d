"""A/B bench: fused Pallas causal attention in the CLIP text tower.

Round-3 verdict item 3: CLIP is 39% of serving wall-clock at ~32% stage
MFU because the [B,12,77,77] f32 score tensor spills out of VMEM
(docs/ROOFLINE.md:31-39). This sweeps {einsum, flash} x {chunk} x
{block_b} on the full tower at the headline batch with the slope method
(dispatch-overhead-free, like bench_stages.py).

    python scripts/bench_clip_flash.py [--batch 128] [--json out.json]
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
    p.add_argument("--json", default="")
    args = p.parse_args()

    from mld_tpu.config import load_config
    from mld_tpu.models.mld import MLD

    cfg = load_config(preset="mld_humanml3d")
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    ids = jnp.asarray(mld.tokenizer(
        ["a person walks forward and waves both hands"] * args.batch))

    arms = [
        ("einsum_chunk0", {"MLD_TPU_CLIP_FLASH": "0",
                           "MLD_TPU_CLIP_CHUNK": "0"}),
        ("einsum_chunk32", {"MLD_TPU_CLIP_FLASH": "0",
                            "MLD_TPU_CLIP_CHUNK": "32"}),
        ("flash_b1_chunk0", {"MLD_TPU_CLIP_FLASH": "1",
                             "MLD_TPU_CLIP_CHUNK": "0",
                             "MLD_TPU_FLASH_BLOCK_B": "1"}),
        ("flash_b2_chunk0", {"MLD_TPU_CLIP_FLASH": "1",
                             "MLD_TPU_CLIP_CHUNK": "0",
                             "MLD_TPU_FLASH_BLOCK_B": "2"}),
        ("flash_b4_chunk0", {"MLD_TPU_CLIP_FLASH": "1",
                             "MLD_TPU_CLIP_CHUNK": "0",
                             "MLD_TPU_FLASH_BLOCK_B": "4"}),
        ("flash_b8_chunk0", {"MLD_TPU_CLIP_FLASH": "1",
                             "MLD_TPU_CLIP_CHUNK": "0",
                             "MLD_TPU_FLASH_BLOCK_B": "8"}),
        ("flash_b1_chunk32", {"MLD_TPU_CLIP_FLASH": "1",
                              "MLD_TPU_CLIP_CHUNK": "32",
                              "MLD_TPU_FLASH_BLOCK_B": "1"}),
    ]

    results = {}
    ref_out = None
    for name, env in arms:
        for k, v in env.items():
            os.environ[k] = v
        jax.clear_caches()  # chunk/flash/block flags are trace-time

        def chained(n):
            def fn(p_, t):
                def body(x, _):
                    zero = (x * 0).astype(t.dtype)
                    e = mld.encode_text_tokens(p_, t + zero)
                    return e.mean(), None
                out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
                return out
            return fn

        # numerics guard: every arm must produce ~the same embedding
        emb = np.asarray(jax.jit(
            lambda p_, t: mld.encode_text_tokens(p_, t))(params, ids))
        if ref_out is None:
            ref_out = emb
        maxdiff = float(np.max(np.abs(emb - ref_out)))

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
        results[name] = {"ms": round(ms, 3), "maxdiff_vs_arm0": maxdiff}
        print(f"{name:20s}: {ms:7.3f} ms  (maxdiff {maxdiff:.2e})")

    report = {"device": jax.devices()[0].device_kind,
              "batch": args.batch, "arms": results}
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()

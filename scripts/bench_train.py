"""Training-step throughput benchmark (flagship config, one chip).

Reference anchor: ~1 day for 2000 epochs of HumanML3D (~24.5k clips) at
batch 64 on one GPU (README.md:207) ≈ 8.9 optimizer steps/sec.

    python scripts/bench_train.py [--stage diffusion|vae] [--batch 64]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_STEPS_PER_SEC = 2000 * (24500 // 64) / (24 * 3600)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="diffusion",
                   choices=["vae", "diffusion"])
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mld_tpu.config import load_config
    from mld_tpu.models.mld import MLD
    from mld_tpu.train.steps import create_train_state, make_train_step

    cfg = load_config(preset="mld_humanml3d")
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    state = create_train_state(mld, params, args.stage)
    step = make_train_step(mld, args.stage, donate=True)

    B, T = args.batch, cfg.dataset.max_motion_len
    rng_np = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rng_np.randn(B, T, cfg.dataset.nfeats),
                              jnp.float32),
        "mask": jnp.asarray(
            np.arange(T)[None] < rng_np.randint(64, T + 1, (B, 1))),
        "text_ids": jnp.asarray(mld.tokenizer(["a person walks"] * B)),
    }
    key = jax.random.PRNGKey(1)
    state, logs = step(state, batch, key)  # compile
    np.asarray(logs["total"])              # real barrier (tunneled platform)

    start = time.perf_counter()
    for i in range(args.iters):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
    np.asarray(logs["total"])
    elapsed = time.perf_counter() - start

    steps_per_sec = args.iters / elapsed
    print(json.dumps({
        "metric": f"{args.stage}_train_step_throughput",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec/chip",
        "batch_size": args.batch,
        "vs_baseline": round(steps_per_sec / REF_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

"""DDIM step-count ablation: quality vs sampling cost.

The reference publishes its inference-time ablation (DDIM 50 vs other
schedules: FLOPs, FID, AITS) only as an embedded image
(reference README.md:230-231). This reproduces the protocol as a real
artifact on the synthetic-trained model from train_synthetic_e2e.py:
for each step count, the full eval protocol (FID/R-precision/Matching/
Diversity through the trained t2m evaluator bundle) plus measured
sampling throughput on the current backend.

    python scripts/train_synthetic_e2e.py --workdir /tmp/e2e
    python scripts/ablate_ddim_steps.py --workdir /tmp/e2e \
        --out docs/ddim_ablation_r4.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--steps", type=int, nargs="+",
                   default=[5, 10, 20, 50, 100])
    p.add_argument("--bench-batch", type=int, default=128)
    p.add_argument("--bench-iters", type=int, default=10)
    p.add_argument("--guidance", type=float, default=2.5,
                   help="match the e2e protocol's short-budget CFG scale")
    p.add_argument("--out", default="ddim_ablation.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mld_tpu.config import load_config
    from mld_tpu.data.datamodule import get_datamodule
    from mld_tpu.eval.pipeline import Evaluator
    from mld_tpu.models.mld import MLD, lengths_to_mask
    from mld_tpu.utils.checkpoint import load_params_npz

    data_root = os.path.join(args.workdir, "data")
    t2m_path = os.path.join(args.workdir, "t2m_eval_params.npz")
    params_path = os.path.join(args.workdir, "trained_params.npz")

    report = {"backend": jax.default_backend(),
              "device": jax.devices()[0].device_kind,
              "guidance": args.guidance, "arms": {}}
    loaded = None
    for n_steps in args.steps:
        # architecture from the workdir's resolved protocol config
        # (train_synthetic_e2e.py writes cfg.json; legacy workdirs fall
        # back to the r4 small-protocol dims)
        cfg_json = os.path.join(args.workdir, "cfg.json")
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                base = json.load(f)
        else:
            base = {"model": {"latent_dim": 64, "ff_size": 128,
                              "num_layers": 3, "denoiser_num_layers": 3,
                              "num_heads": 4, "text_encoded_dim": 64,
                              "clip_layers": 2, "clip_heads": 2}}
        base["debug"] = False
        base.setdefault("model", {})["guidance_scale"] = args.guidance
        base["model"].setdefault("scheduler", {})[
            "num_inference_timesteps"] = n_steps
        base.setdefault("dataset", {}).update(
            {"root": data_root, "max_motion_len": 96, "min_motion_len": 16})
        base.setdefault("eval", {}).update(
            {"batch_size": 32, "diversity_times": 30, "r_size": 32,
             "t2m_params_path":
                 t2m_path if os.path.exists(t2m_path) else ""})
        cfg = load_config(None, base, preset="mld_humanml3d")
        mld = MLD(cfg)
        dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
        mld.mean = jnp.asarray(dm.mean, jnp.float32)
        mld.std = jnp.asarray(dm.std, jnp.float32)
        mld.mean_eval = jnp.asarray(dm.mean_eval, jnp.float32)
        mld.std_eval = jnp.asarray(dm.std_eval, jnp.float32)
        if loaded is None:
            loaded = load_params_npz(params_path)
        ev = Evaluator(cfg, mld, dm)
        res = ev.run_split(loaded,
                           dm.loader("test", shuffle=False, drop_last=True),
                           jax.random.PRNGKey(7), stage="diffusion")
        arm = {k: float(v) for k, v in res.items()}

        # throughput at this step count (flagship-shaped timing would need
        # the flagship model; this times the e2e model itself, so the
        # RELATIVE cost across step counts is the signal)
        B, T = args.bench_batch, cfg.dataset.max_motion_len
        ids = mld.tokenize(["a person walks forward"] * B)
        lengths = jnp.asarray(
            np.random.RandomState(0).randint(32, T + 1, B))
        mask = lengths_to_mask(lengths, T)
        rng = jax.random.PRNGKey(1)
        out = mld.generate_joints(loaded, ids, mask, rng)
        np.asarray(out[0, 0, 0])
        t0 = time.perf_counter()
        for i in range(args.bench_iters):
            out = mld.generate_joints(loaded, ids, mask,
                                      jax.random.PRNGKey(2 + i))
        np.asarray(out[0, 0, 0])
        dt = time.perf_counter() - t0
        arm["motions_per_sec"] = round(B * args.bench_iters / dt, 1)
        arm["aits_ms"] = round(dt / (B * args.bench_iters) * 1e3, 4)
        report["arms"][str(n_steps)] = arm
        print(f"steps={n_steps:4d} FID={arm.get('FID', float('nan')):8.3f} "
              f"R@1={arm.get('R_precision_top_1', float('nan')):6.3f} "
              f"{arm['motions_per_sec']:9.1f} motions/s", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

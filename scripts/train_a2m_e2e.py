"""End-to-end a2m (action-to-motion) validation on synthetic HumanAct12.

The t2m analog is scripts/train_synthetic_e2e.py; this gives the a2m
protocol the same evidence treatment (VERDICT r4 task 4): train the
HumanAct12-GRU classifier in-repo (eval/a2m_train.py — the stand-in for
the reference's frozen actionrecognition checkpoint,
mld/models/metrics/gru.py:13 + modeltype/base.py:154-155), train the
actor-VAE + latent-diffusion stages on the class-conditioned synthetic
corpus, then drive the FULL `test.py --preset mld_humanact12` protocol
for (trained vs random-init) generators under the trained classifier —
plus a random-classifier control arm. Writes one JSON report.

    python scripts/train_a2m_e2e.py --steps 2000 --out docs/e2e_a2m_r5.json
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000,
                   help="training steps per MLD stage (vae, diffusion)")
    p.add_argument("--cls-steps", type=int, default=600,
                   help="classifier training steps (eval/a2m_train.py)")
    p.add_argument("--replication", type=int, default=2)
    p.add_argument("--guidance", type=float, default=2.5)
    p.add_argument("--out", default="e2e_a2m_report.json")
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    from mld_tpu.config import config_to_dict, load_config
    from mld_tpu.data.datamodule import get_datamodule
    from mld_tpu.eval.a2m_train import train_a2m_classifier
    from mld_tpu.models.mld import MLD
    from mld_tpu.train.steps import (create_train_state, full_params,
                                     make_train_step)
    from mld_tpu.utils.checkpoint import save_params_npz

    workdir = args.workdir or tempfile.mkdtemp(prefix="mld_a2m_e2e_")
    data_root = os.path.join(workdir, "data")
    rec_dir = os.path.join(workdir, "actionrec")
    empty_rec = os.path.join(workdir, "actionrec_random")
    os.makedirs(rec_dir, exist_ok=True)
    os.makedirs(empty_rec, exist_ok=True)

    overrides = {
        "debug": False,
        "model": {"latent_dim": 64, "ff_size": 128, "num_layers": 3,
                  "denoiser_num_layers": 3, "num_heads": 4,
                  "guidance_scale": args.guidance,
                  "humanact12_rec_path": rec_dir,
                  "scheduler": {"num_inference_timesteps": 10}},
        "dataset": {"root": data_root},
        "train": {"batch_size": 16, "lr": 3e-4},
        "eval": {"batch_size": 32, "diversity_times": 30,
                 "mm_num_samples": 0},
        "test": {"replication_times": args.replication},
    }
    cfg = load_config(None, overrides, preset="mld_humanact12")
    mld = MLD(cfg)
    dm = get_datamodule(cfg)
    mld.mean = jnp.asarray(dm.mean, jnp.float32)
    mld.std = jnp.asarray(dm.std, jnp.float32)
    mld.mean_eval = jnp.asarray(dm.mean_eval, jnp.float32)
    mld.std_eval = jnp.asarray(dm.std_eval, jnp.float32)

    report = {"steps": args.steps, "backend": jax.default_backend(),
              "chance_accuracy": 1.0 / cfg.model.nclasses}

    # --------------------------------------------- stage 0: GRU classifier
    cls_params, cls_report = train_a2m_classifier(cfg, dm, mld,
                                                  steps=args.cls_steps)
    save_params_npz(os.path.join(rec_dir, "humanact12_gru_params.npz"),
                    cls_params)
    report["classifier"] = cls_report

    rng = jax.random.PRNGKey(0)
    params = mld.init_params(rng)

    def batches(seed=0):
        loader = dm.loader("train", seed=seed)
        while True:
            for b in loader:
                yield {k: jnp.asarray(v) for k, v in b.items()
                       if k in ("motion", "mask", "action")}

    # ------------------------------------------------- stage 1: actor VAE
    state = create_train_state(mld, params, "vae")
    step = make_train_step(mld, "vae", donate=False)
    gen = batches(seed=1)
    t0 = time.time()
    first = last = None
    for i in range(args.steps):
        rng, srng = jax.random.split(rng)
        state, logs = step(state, next(gen), srng)
        if i == 0:
            first = float(logs["total"])
        last = float(logs["total"])
    report["vae"] = {"loss_first": first, "loss_last": last,
                     "seconds": time.time() - t0}
    params = full_params(state)

    # ------------------------------------------------- stage 2: diffusion
    state = create_train_state(mld, params, "diffusion")
    step = make_train_step(mld, "diffusion", donate=False)
    gen = batches(seed=2)
    t0 = time.time()
    for i in range(args.steps):
        rng, srng = jax.random.split(rng)
        state, logs = step(state, next(gen), srng)
        if i == 0:
            first = float(logs["total"])
        last = float(logs["total"])
    report["diffusion"] = {"loss_first": first, "loss_last": last,
                           "seconds": time.time() - t0}
    trained = full_params(state)
    ckpt_path = os.path.join(workdir, "trained_params.npz")
    save_params_npz(ckpt_path, jax.device_get(trained))
    report["params_path"] = ckpt_path

    # ------------------------- the FULL test.py protocol (4 arms, 3 runs)
    # YAML overlay so the subprocess builds the identical tiny config
    import yaml
    cfg_yaml = os.path.join(workdir, "a2m_e2e.yaml")
    with open(cfg_yaml, "w") as f:
        yaml.safe_dump(overrides, f)
    cfg_yaml_randcls = os.path.join(workdir, "a2m_e2e_randcls.yaml")
    rand_over = json.loads(json.dumps(overrides))
    rand_over["model"]["humanact12_rec_path"] = empty_rec
    with open(cfg_yaml_randcls, "w") as f:
        yaml.safe_dump(rand_over, f)

    def run_test(tag, cfg_path, checkpoint=None):
        out = os.path.join(workdir, f"metrics_{tag}.json")
        cmd = [sys.executable, os.path.join(REPO, "test.py"),
               "--cfg", cfg_path, "--preset", "mld_humanact12",
               "--replication", str(args.replication), "--no_mm",
               "--out", out]
        if checkpoint:
            cmd += ["--checkpoint", checkpoint]
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                           timeout=3600)
        if r.returncode != 0:
            print(r.stdout[-4000:], file=sys.stderr)
            print(r.stderr[-4000:], file=sys.stderr)
            raise RuntimeError(f"test.py arm {tag} failed")
        with open(out) as f:
            return json.load(f)

    report["trained_cls_trained_gen"] = run_test(
        "trained_trained", cfg_yaml, ckpt_path)
    report["trained_cls_random_gen"] = run_test(
        "trained_random", cfg_yaml, None)
    report["random_cls_trained_gen"] = run_test(
        "random_trained", cfg_yaml_randcls, ckpt_path)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    tt = report["trained_cls_trained_gen"]
    tr = report["trained_cls_random_gen"]
    chance = report["chance_accuracy"]
    ok = (report["classifier"]["train_acc_last"] > 3 * chance
          and tt["gt_accuracy"] > 3 * chance          # classifier sees GT
          and tt["FID"] < tr["FID"]                   # FID orders training
          and tt["accuracy"] > tr["accuracy"] - 1e-9)
    print("A2M E2E LEARNING CHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""End-to-end two-stage training validation on synthetic data.

Trains stage-1 VAE then stage-2 latent diffusion on the synthetic
HumanML3D-layout dataset, then runs the evaluation protocol before/after to
confirm the full pipeline learns (reconstruction error falls, diffusion FID
improves over a random-init model). Writes a JSON report.

    python scripts/train_synthetic_e2e.py --steps 400 --out e2e_report.json
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--guidance", type=float, default=2.5,
                   help="CFG scale for the eval sampling passes: the "
                        "reference 7.5 assumes a converged denoiser; "
                        "on short synthetic budgets it extrapolates "
                        "latents ~4x outside the VAE prior (measured) "
                        "and buries the learning signal")
    p.add_argument("--samples", type=int, default=320)
    p.add_argument("--eval-steps", type=int, default=1000,
                   help="contrastive training steps for the t2m evaluator "
                        "bundle (eval/t2m_train.py)")
    p.add_argument("--clip-steps", type=int, default=800,
                   help="CLIP text-tower pretraining steps "
                        "(train/pretrain.py — the synthetic analog of the "
                        "reference's frozen pretrained CLIP)")
    p.add_argument("--out", default="e2e_report.json")
    p.add_argument("--workdir", default=None)
    p.add_argument("--model-scale", default="small",
                   choices=["small", "large"],
                   help="small = the r4 protocol dims; large = near-"
                        "flagship generator dims (latent 2x256, ff 1024, "
                        "7-layer denoiser) — the r5 fix for the VAE-recon "
                        "bottleneck (recon FID capped the whole pipeline "
                        "at ~14k, docs/e2e_report_r5.json diagnosis)")
    p.add_argument("--batch-size", type=int, default=0,
                   help="0 = per-scale default (16 small / 32 large)")
    p.add_argument("--lr-schedule", default="const",
                   choices=["const", "cosine"],
                   help="cosine: warmup-cosine decay over --steps per "
                        "stage (protocol-only knob; the library optimizer "
                        "keeps reference-parity constant AdamW)")
    p.add_argument("--reuse-eval-bundle", action="store_true",
                   help="load workdir/t2m_eval_params.npz instead of "
                        "retraining it — keeps the metric measuring stick "
                        "FIXED across training-precision arms "
                        "(scripts/train_precision_study.py)")
    p.add_argument("--params-name", default="trained_params.npz",
                   help="filename for the trained parameter bundle inside "
                        "--workdir (per-arm names for the precision study)")
    p.add_argument("--reuse-vae", default=None, metavar="BUNDLE_NPZ",
                   help="load the stage-1 VAE subtree from an existing "
                        "trained bundle and skip VAE training. Valid "
                        "because the VAE stage never sees text: its "
                        "weights are independent of the tokenizer, unlike "
                        "the CLIP/denoiser stages (the r5 hash-salt "
                        "incident forced exactly this partial retrain)")
    p.add_argument("--skip-loop", action="store_true",
                   help="skip the train() driver val-curve section")
    p.add_argument("--skip-final-eval", action="store_true",
                   help="skip the in-process random-vs-trained eval "
                        "(arms are evaluated out-of-process at a fixed "
                        "serving precision instead)")
    p.add_argument("--preset", default="mld_humanml3d",
                   choices=["mld_humanml3d", "mld_kit"],
                   help="mld_kit proves the 251-feat/21-joint KIT preset "
                        "end to end (VERDICT r1 task 9)")
    args = p.parse_args()

    from mld_tpu.config import load_config
    from mld_tpu.data.datamodule import get_datamodule
    from mld_tpu.data.synthetic import build_synthetic_dataset
    from mld_tpu.eval.pipeline import Evaluator
    from mld_tpu.models.mld import MLD
    from mld_tpu.train.steps import (
        create_train_state,
        full_params,
        make_train_step,
    )

    workdir = args.workdir or tempfile.mkdtemp(prefix="mld_e2e_")
    data_root = os.path.join(workdir, "data")
    if not os.path.exists(os.path.join(data_root, "Mean.npy")):
        # generate on CPU in a subprocess — the codec's eager jnp ops are
        # pathological through the remote-TPU tunnel
        import subprocess
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        # splits sized for discriminative metrics: test must hold >=3
        # R-precision groups of 32 (tm2t.py:100-137 reference protocol)
        code = ("import sys; sys.path.insert(0, %r); "
                "from mld_tpu.data.synthetic import build_synthetic_dataset;"
                " build_synthetic_dataset(%r, n_samples=%d, seed=0,"
                " splits=(0.55, 0.15, 0.3), dataset=%r)" % (
                    os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), data_root, args.samples,
                    "kit" if args.preset == "mld_kit" else "humanml3d"))
        subprocess.run([sys.executable, "-c", code], env=env, check=True,
                       timeout=3600)

    if args.model_scale == "large":
        # near-flagship generator dims: the precision studies instrument
        # this model's serving program, so its matmul shapes should match
        # what bench.py ships (denoiser d=256/ff=1024; latent_size 2 for
        # recon capacity — the r5 bottleneck diagnosis)
        model_dims = {"latent_dim": 256, "latent_size": 2, "ff_size": 1024,
                      "num_layers": 5, "denoiser_num_layers": 7,
                      "num_heads": 4, "text_encoded_dim": 256,
                      "clip_layers": 4, "clip_heads": 4}
        default_bs = 32
        n_infer = 50
    else:
        model_dims = {"latent_dim": 64, "ff_size": 128, "num_layers": 3,
                      "denoiser_num_layers": 3, "num_heads": 4,
                      "text_encoded_dim": 64, "clip_layers": 2,
                      "clip_heads": 2}
        default_bs = 16
        n_infer = 10
    overrides = {
        "debug": False,
        "model": {**model_dims,
                  "guidance_scale": args.guidance,
                  "scheduler": {"num_inference_timesteps": n_infer}},
        "dataset": {"root": data_root, "max_motion_len": 96,
                    "min_motion_len": 16},
        "train": {"batch_size": args.batch_size or default_bs, "lr": 3e-4},
        # reference-protocol R-size 32 (needs the trained evaluator bundle
        # below to be meaningful; random-init evaluators = chance)
        "eval": {"batch_size": 32, "diversity_times": 30,
                 "mm_num_samples": 2, "mm_num_repeats": 4,
                 "mm_num_times": 2},
    }
    if args.preset == "mld_kit":
        overrides["dataset"]["min_motion_len"] = 8
    cfg = load_config(None, overrides, preset=args.preset)
    # persist the resolved protocol config so downstream studies
    # (precision_study / train_precision_study / ablate_ddim_steps) build
    # the SAME architecture instead of hardcoding dims
    from mld_tpu.config import config_to_dict
    with open(os.path.join(workdir, "cfg.json"), "w") as f:
        json.dump(config_to_dict(cfg), f, indent=1)
    mld = MLD(cfg)
    dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
    mld.mean = jnp.asarray(dm.mean, jnp.float32)
    mld.std = jnp.asarray(dm.std, jnp.float32)
    mld.mean_eval = jnp.asarray(dm.mean_eval, jnp.float32)
    mld.std_eval = jnp.asarray(dm.std_eval, jnp.float32)

    rng = jax.random.PRNGKey(0)
    params = mld.init_params(rng)
    report = {"steps": args.steps, "backend": jax.default_backend()}

    # ---------------------------------------- stage 0: t2m evaluator bundle
    # (the reference ships frozen pretrained evaluators; here they are
    # trained in-repo on the caption-conditioned corpus so R-precision/FID
    # can discriminate — VERDICT r2 task 6)
    from mld_tpu.eval.t2m_train import train_t2m_evaluator
    from mld_tpu.utils.checkpoint import save_params_npz

    t2m_path = os.path.join(workdir, "t2m_eval_params.npz")
    if args.reuse_eval_bundle and os.path.exists(t2m_path):
        report["t2m_evaluator"] = {"reused": t2m_path}
    else:
        t2m_params, t2m_report = train_t2m_evaluator(
            cfg, dm, steps=args.eval_steps)
        save_params_npz(t2m_path, t2m_params)
        report["t2m_evaluator"] = t2m_report
    cfg.eval.t2m_params_path = t2m_path

    # -------------------------------------------- stage 0b: CLIP pretraining
    # the reference's denoiser conditions on a frozen PRETRAINED CLIP; a
    # random-init tower feeds the denoiser near-noise text features and
    # generated R-precision stays at chance regardless of stage-2 budget
    # (train/pretrain.py docstring). Pretrain the tower on the corpus's
    # deterministic caption->style map, then freeze — same protocol shape.
    from mld_tpu.train.pretrain import pretrain_clip_text

    params, clip_report = pretrain_clip_text(cfg, dm, mld, params,
                                             steps=args.clip_steps)
    report["clip_pretrain"] = clip_report

    def batches(split="train", seed=0):
        loader = dm.loader(split, seed=seed, drop_last=True)
        while True:
            for b in loader:
                yield {k: jnp.asarray(v) for k, v in b.items()
                       if k in ("motion", "mask", "text_ids")}

    def make_tx():
        if args.lr_schedule != "cosine":
            return None  # library default: reference-parity constant AdamW
        import optax
        sched = optax.warmup_cosine_decay_schedule(
            init_value=cfg.train.lr * 0.05, peak_value=cfg.train.lr,
            warmup_steps=max(50, args.steps // 20), decay_steps=args.steps,
            end_value=cfg.train.lr * 0.02)
        return optax.apply_if_finite(
            optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=1e-2),
            max_consecutive_errors=100)

    # ---------------------------------------------------------- stage 1: VAE
    if args.reuse_vae:
        from mld_tpu.utils.checkpoint import load_params_npz
        donor = load_params_npz(args.reuse_vae)
        params = dict(params)
        params["vae"] = donor["vae"]
        report["vae"] = {"reused": args.reuse_vae}
    else:
        state = create_train_state(mld, params, "vae", tx=make_tx())
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

    # ----------------------------------------------------- stage 2: diffusion
    state = create_train_state(mld, params, "diffusion", tx=make_tx())
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

    params_path = os.path.join(workdir, args.params_name)
    save_params_npz(params_path, jax.device_get(trained))
    report["params_path"] = params_path
    report["data_root"] = data_root

    if args.skip_final_eval:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report, indent=2))
        ok = (("reused" in report["vae"]
           or report["vae"]["loss_last"] < report["vae"]["loss_first"])
              and report["diffusion"]["loss_last"]
              < report["diffusion"]["loss_first"])
        print("E2E LEARNING CHECK:", "PASS" if ok else "FAIL")
        return 0 if ok else 1

    # -------------------------------------------------- eval: random vs trained
    ev = Evaluator(cfg, mld, dm)
    # evaluator sanity: GT-vs-GT R-precision must sit far above chance
    # (1/r_size) or nothing downstream can discriminate
    gt = ev.run_gt(None, dm.loader("test", shuffle=False, drop_last=True),
                   rng)
    report["eval_gt"] = {k: float(v) for k, v in gt.items()}
    rng, r1, r2 = jax.random.split(rng, 3)
    random_params = mld.init_params(jax.random.PRNGKey(99))
    res_rand = ev.run_split(
        random_params, dm.loader("test", shuffle=False, drop_last=True),
        r1, stage="diffusion")
    res_train = ev.run_split(
        trained, dm.loader("test", shuffle=False, drop_last=True),
        r2, stage="diffusion")
    report["eval_random_init"] = {k: float(v) for k, v in res_rand.items()}
    report["eval_trained"] = {k: float(v) for k, v in res_train.items()}

    # -------------------- train() driver w/ in-training metric validation
    # (reference behavior: full t2m metric suite on the val split during
    # training, mld.py:811-907 — produces the per-validation FID curve)
    fid_curve = []
    if args.skip_loop:
        report["val_fid_curve"] = fid_curve
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report, indent=2))
        ok = (("reused" in report["vae"]
           or report["vae"]["loss_last"] < report["vae"]["loss_first"])
              and report["diffusion"]["loss_last"]
              < report["diffusion"]["loss_first"]
              and report["eval_trained"]["FID"]
              < report["eval_random_init"]["FID"])
        print("E2E LEARNING CHECK:", "PASS" if ok else "FAIL")
        return 0 if ok else 1

    from mld_tpu.train.loop import train as train_loop

    loop_cfg = cfg.replace(name="e2e_loop")
    loop_cfg.train.stage = "diffusion"
    loop_cfg.train.end_epoch = 3
    loop_cfg.train.pretrained = params_path
    loop_cfg.logger.folder = os.path.join(workdir, "exp")
    loop_cfg.logger.val_every_epochs = 1
    loop_cfg.logger.save_checkpoint_epoch = 10
    loop_cfg.logger.tensorboard = False
    train_loop(loop_cfg)
    exp_dirs = sorted(os.listdir(os.path.join(loop_cfg.logger.folder,
                                              "mld")))
    fid_curve = []
    for d in exp_dirs:
        mpath = os.path.join(loop_cfg.logger.folder, "mld", d,
                             "metrics.jsonl")
        if not os.path.exists(mpath):
            continue
        with open(mpath) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("split") == "val" and "FID" in rec:
                    fid_curve.append({"epoch": rec["step"],
                                      "FID": rec["FID"],
                                      "R@1": rec.get(
                                          "R_precision_top_1")})
    report["val_fid_curve"] = fid_curve

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    ok = (("reused" in report["vae"]
           or report["vae"]["loss_last"] < report["vae"]["loss_first"])
          and report["diffusion"]["loss_last"]
          < report["diffusion"]["loss_first"]
          and report["eval_trained"]["FID"]
          < report["eval_random_init"]["FID"]
          and len(fid_curve) >= 2)
    print("E2E LEARNING CHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

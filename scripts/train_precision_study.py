"""TRAINING matmul-precision study: does bf16-pass training stay on-curve?

The serving-precision study (scripts/precision_study.py) answers what
precision the *sampler* needs; this answers the training-side question
(VERDICT r4 task 3): retrain the full two-stage protocol (CLIP pretrain ->
VAE -> diffusion, scripts/train_synthetic_e2e.py) under each global matmul
precision with IDENTICAL data, seeds, and step budget, then evaluate every
arm with the SAME frozen f32 measuring stick (the trained t2m evaluator
bundle; serving precision pinned "highest" so the deltas attribute to the
training precision alone).

Guards per VERDICT r4 task 3: loss curves (first/last per stage) + eval
parity (FID/R-precision/Matching deltas vs the f32-trained arm). The
throughput side of the same question is scripts/bench_train.py --sweep.

    python scripts/train_synthetic_e2e.py --steps 4000 --workdir /tmp/e2e
    python scripts/train_precision_study.py --workdir /tmp/e2e \
        --steps 4000 --out docs/train_precision_r5.json
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from precision_study import run_eval  # noqa: E402  (same eval protocol)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS = ("highest", "high", "default")


def train_arm(workdir: str, arm: str, steps: int, clip_steps: int) -> dict:
    """Retrain both stages under `arm` precision; returns the loss report."""
    out = os.path.join(workdir, f"train_report_{arm}.json")
    env = dict(os.environ)
    env["MLD_TPU_MATMUL_PRECISION"] = arm
    env.pop("MLD_TPU_STAGE_PRECISION", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "train_synthetic_e2e.py"),
         "--workdir", workdir, "--steps", str(steps),
         "--clip-steps", str(clip_steps),
         "--reuse-eval-bundle", "--skip-loop", "--skip-final-eval",
         "--params-name", f"trained_params_{arm}.npz", "--out", out],
        env=env, capture_output=True, text=True, timeout=5400)
    if r.returncode != 0:
        raise RuntimeError(f"arm {arm} training failed:\n" + r.stderr[-2000:])
    with open(out) as f:
        rep = json.load(f)
    return {k: rep[k] for k in ("t2m_evaluator", "clip_pretrain", "vae",
                                "diffusion") if k in rep}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True,
                   help="an existing train_synthetic_e2e workdir (its data "
                        "and t2m evaluator bundle are REUSED so every arm "
                        "sees the same corpus and measuring stick)")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--clip-steps", type=int, default=800)
    p.add_argument("--arms", nargs="+", default=list(ARMS), choices=ARMS)
    p.add_argument("--reuse-highest", default="",
                   help="params filename of an already-trained f32 arm "
                        "inside --workdir (e.g. trained_params.npz from the "
                        "e2e run) to skip retraining 'highest'")
    p.add_argument("--out", default="train_precision_report.json")
    args = p.parse_args()

    t2m = os.path.join(args.workdir, "t2m_eval_params.npz")
    if not os.path.exists(t2m):
        raise SystemExit(f"missing {t2m}: run train_synthetic_e2e.py first")

    report = {"steps": args.steps, "arms": {}}
    for arm in args.arms:
        params_name = f"trained_params_{arm}.npz"
        if arm == "highest" and args.reuse_highest:
            params_name = args.reuse_highest
            report["arms"][arm] = {"reused_params": params_name}
        else:
            report["arms"][arm] = train_arm(args.workdir, arm, args.steps,
                                            args.clip_steps)
        # eval parity: serving precision pinned f32 for EVERY arm — only
        # the training precision differs between arms
        res = run_eval(args.workdir, "highest", params_name=params_name)
        report["arms"][arm]["eval_f32_serving"] = res
        print(f"{arm}: FID={res['FID']:.4f} R@1={res['R_precision_top_1']:.4f}"
              f" Matching={res['Matching_score']:.4f}", flush=True)

    if "highest" in report["arms"]:
        base = report["arms"]["highest"]["eval_f32_serving"]
        denom = max(abs(base["FID"]), 1e-6)
        for arm, rec in report["arms"].items():
            if arm == "highest":
                continue
            rec["fid_rel_delta_vs_f32_train"] = (
                abs(rec["eval_f32_serving"]["FID"] - base["FID"]) / denom)
            print(f"FID relative delta ({arm}-trained vs f32-trained): "
                  f"{rec['fid_rel_delta_vs_f32_train']*100:.2f}%")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Matmul-precision study with TRAINED weights: does bf16-pass matmul
(XLA "default") shift evaluator metrics vs full-f32 ("highest")?

Runs the eval protocol on the synthetic-trained model from
train_synthetic_e2e.py under both precisions (each in its own subprocess so
the global precision config is clean) and reports the deltas. This is the
evidence needed before flipping the throughput mode on for serving.

    python scripts/train_synthetic_e2e.py --workdir /tmp/e2e --steps 300
    python scripts/precision_study.py --workdir /tmp/e2e
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_EVAL_CODE = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp
from mld_tpu.config import load_config
from mld_tpu.data.datamodule import get_datamodule
from mld_tpu.eval.pipeline import Evaluator
from mld_tpu.models.mld import MLD
from mld_tpu.utils.checkpoint import load_params_npz

# architecture comes from the workdir's resolved protocol config
# (train_synthetic_e2e.py writes cfg.json) so the study always builds the
# model that was actually trained; legacy workdirs fall back to the r4
# small-protocol dims
_cfg_json = os.path.join(os.path.dirname(%(data)r), "cfg.json")
if os.path.exists(_cfg_json):
    with open(_cfg_json) as f:
        base = json.load(f)
else:
    base = {"model": {"latent_dim": 64, "ff_size": 128, "num_layers": 3,
                      "denoiser_num_layers": 3, "num_heads": 4,
                      "text_encoded_dim": 64, "clip_layers": 2,
                      "clip_heads": 2,
                      "scheduler": {"num_inference_timesteps": 10}}}
base["debug"] = False
base.setdefault("dataset", {}).update(
    {"root": %(data)r, "max_motion_len": 96, "min_motion_len": 16})
# reference-protocol eval shape (matches train_synthetic_e2e.py), with
# the TRAINED t2m evaluator bundle — random-init evaluators pin
# R-precision at chance and hide any precision-induced shift
base.setdefault("eval", {}).update(
    {"batch_size": 32, "diversity_times": 30, "r_size": 32,
     "t2m_params_path": %(t2m)r})
cfg = load_config(None, base, preset="mld_humanml3d")
mld = MLD(cfg)
dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
mld.mean = jnp.asarray(dm.mean, jnp.float32)
mld.std = jnp.asarray(dm.std, jnp.float32)
mld.mean_eval = jnp.asarray(dm.mean_eval, jnp.float32)
mld.std_eval = jnp.asarray(dm.std_eval, jnp.float32)
params = load_params_npz(%(params)r)
ev = Evaluator(cfg, mld, dm)
res = ev.run_split(params, dm.loader("test", shuffle=False, drop_last=True),
                   jax.random.PRNGKey(%(seed)d), stage="diffusion")
print("RESULT_JSON:" + json.dumps({k: float(v) for k, v in res.items()}))
"""


def run_eval(workdir: str, precision: str, stage_spec: str = "",
             allow_random_eval: bool = False,
             params_name: str = "trained_params.npz",
             seed: int = 7) -> dict:
    env = dict(os.environ)
    env["MLD_TPU_MATMUL_PRECISION"] = precision
    if stage_spec:
        env["MLD_TPU_STAGE_PRECISION"] = stage_spec
    else:
        env.pop("MLD_TPU_STAGE_PRECISION", None)
    t2m = os.path.join(workdir, "t2m_eval_params.npz")
    if not os.path.exists(t2m):
        # a random-init evaluator pins R-precision at chance and HIDES any
        # precision-induced shift — a report built on it looks valid but
        # cannot detect anything (ADVICE r4). Refuse by default.
        if not allow_random_eval:
            raise SystemExit(
                f"trained evaluator bundle not found: {t2m}\n"
                "run scripts/train_synthetic_e2e.py with this --workdir "
                "first, or pass --allow-random-eval to proceed anyway "
                "(the report will NOT be able to detect precision shifts)")
        print(f"WARNING: {t2m} missing — random-init evaluator; the report "
              "cannot detect precision shifts", file=sys.stderr)
    code = _EVAL_CODE % {
        "repo": REPO,
        "data": os.path.join(workdir, "data"),
        "params": os.path.join(workdir, params_name),
        "t2m": t2m if os.path.exists(t2m) else "",
        "seed": seed,
    }
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1700)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("RESULT_JSON:")][-1]
    return json.loads(line[len("RESULT_JSON:"):])


# arm -> (global precision, per-stage overlay). The three *_bf16 arms
# attribute the full-bf16 FID shift to a single serving stage; gen_bf16
# runs ALL generation stages bf16 while the t2m evaluator stays f32.
# The distinction matters: the global "default" arm also runs the
# EVALUATOR networks at bf16, so its FID delta conflates the precision of
# the thing being measured with the precision of the measuring stick —
# generation-precision decisions must come from the base="highest" arms.
ARMS = {
    "highest": ("highest", ""),
    "default": ("default", ""),
    "clip_bf16": ("highest", "clip=default"),
    "scan_bf16": ("highest", "scan=default"),
    "decode_bf16": ("highest", "decode=default"),
    "scan_high": ("highest", "scan=high"),
    "decode_high": ("highest", "decode=high"),
    "gen_bf16": ("highest", "clip=default,scan=default,decode=default"),
    # candidate shipping generation config measured with an f32 measuring
    # stick: CLIP bf16 (where the FLOPs are), scan+decode at "high"
    # (3-pass bf16, ~2x cheaper than "highest"'s 6)
    "gen_mixed_high": ("highest", "clip=default,scan=high,decode=high"),
    # faster candidate: bf16 CLIP+scan, decode kept at "high" (decode is
    # the one stage whose bf16 arm shows a direct, non-chaotic feature
    # quantization shift)
    "gen_fast": ("highest", "clip=default,scan=default,decode=high"),
    "serving_mixed": ("default", "scan=highest,decode=highest"),
    # sampling-noise floor: identical numerics to "highest", different
    # eval PRNG seed. The DDIM iteration is chaotic w.r.t. any
    # perturbation, so a precision arm whose |FID delta| is within the
    # spread of these arms carries no quality signal — only arms that
    # EXCEED the seed spread indicate a real numeric degradation.
    "noise_seed8": ("highest", ""),
    "noise_seed9": ("highest", ""),
    "noise_seed10": ("highest", ""),
}

ARM_SEEDS = {"noise_seed8": 8, "noise_seed9": 9, "noise_seed10": 10}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--arms", nargs="+", default=list(ARMS),
                   choices=list(ARMS))
    p.add_argument("--out", default="precision_report.json")
    p.add_argument("--allow-random-eval", action="store_true",
                   help="proceed without the trained evaluator bundle "
                        "(the report will not detect precision shifts)")
    args = p.parse_args()

    report = {}
    for arm in args.arms:
        prec, spec = ARMS[arm]
        report[arm] = run_eval(args.workdir, prec, spec,
                               allow_random_eval=args.allow_random_eval,
                               seed=ARM_SEEDS.get(arm, 7))
        report[arm]["_env"] = {"MLD_TPU_MATMUL_PRECISION": prec,
                               "MLD_TPU_STAGE_PRECISION": spec}
        print(f"{arm}: FID={report[arm]['FID']:.4f} "
              f"Matching={report[arm]['Matching_score']:.4f}", flush=True)
        with open(args.out, "w") as f:  # incremental: survive timeouts
            json.dump(report, f, indent=2)
    if "highest" in report:
        f32 = report["highest"]
        denom = max(abs(f32["FID"]), 1e-6)
        for arm in args.arms:
            if arm == "highest":
                continue
            delta = abs(report[arm]["FID"] - f32["FID"]) / denom
            report[arm]["fid_rel_delta_vs_f32"] = delta
            print(f"FID relative delta ({arm} vs f32): {delta*100:.2f}%")
        if "default" in report:  # backwards-compat field
            report["fid_rel_delta"] = report["default"][
                "fid_rel_delta_vs_f32"]
        noise = [report[a]["fid_rel_delta_vs_f32"] for a in args.arms
                 if a in ARM_SEEDS and a in report]
        if noise:
            floor = max(noise)
            report["fid_noise_floor"] = floor
            for arm in args.arms:
                if arm == "highest" or arm in ARM_SEEDS:
                    continue
                report[arm]["exceeds_noise_floor"] = bool(
                    report[arm]["fid_rel_delta_vs_f32"] > floor)
            print(f"FID sampling-noise floor (seed re-rolls): "
                  f"{floor*100:.2f}%")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()

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

cfg = load_config(None, {
    "debug": False,
    "model": {"latent_dim": 64, "ff_size": 128, "num_layers": 3,
              "denoiser_num_layers": 3, "num_heads": 4,
              "text_encoded_dim": 64, "clip_layers": 2, "clip_heads": 2,
              "scheduler": {"num_inference_timesteps": 10}},
    "dataset": {"root": %(data)r, "max_motion_len": 96,
                "min_motion_len": 16},
    "eval": {"batch_size": 16, "diversity_times": 8, "r_size": 4},
}, preset="mld_humanml3d")
mld = MLD(cfg)
dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
mld.mean = jnp.asarray(dm.mean, jnp.float32)
mld.std = jnp.asarray(dm.std, jnp.float32)
mld.mean_eval = jnp.asarray(dm.mean_eval, jnp.float32)
mld.std_eval = jnp.asarray(dm.std_eval, jnp.float32)
params = load_params_npz(%(params)r)
ev = Evaluator(cfg, mld, dm)
res = ev.run_split(params, dm.loader("test", shuffle=False, drop_last=True),
                   jax.random.PRNGKey(7), stage="diffusion")
print("RESULT_JSON:" + json.dumps({k: float(v) for k, v in res.items()}))
"""


def run_eval(workdir: str, precision: str) -> dict:
    env = dict(os.environ)
    env["MLD_TPU_MATMUL_PRECISION"] = precision
    code = _EVAL_CODE % {
        "repo": REPO,
        "data": os.path.join(workdir, "data"),
        "params": os.path.join(workdir, "trained_params.npz"),
    }
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1700)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("RESULT_JSON:")][-1]
    return json.loads(line[len("RESULT_JSON:"):])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--out", default="precision_report.json")
    args = p.parse_args()

    report = {}
    for prec in ("highest", "default"):
        report[prec] = run_eval(args.workdir, prec)
        print(f"{prec}: FID={report[prec]['FID']:.4f} "
              f"Matching={report[prec]['Matching_score']:.4f}")
    f32, bf16 = report["highest"], report["default"]
    denom = max(abs(f32["FID"]), 1e-6)
    report["fid_rel_delta"] = abs(bf16["FID"] - f32["FID"]) / denom
    print(f"FID relative delta (bf16-pass vs f32): "
          f"{report['fid_rel_delta'] * 100:.2f}%")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()

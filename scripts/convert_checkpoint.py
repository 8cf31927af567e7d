"""Convert a released reference checkpoint (torch .ckpt) to mld_tpu params.

    python scripts/convert_checkpoint.py \
        --ckpt models/mld_humanml3d_checkpoint/1222_mld_humanml3d_FID041.ckpt \
        --preset mld_humanml3d --out converted_params.npz

The output loads via `--checkpoint converted_params.npz` in demo.py/test.py
(or pass the .ckpt directly — conversion also happens on the fly).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--preset", default="mld_humanml3d")
    p.add_argument("--cfg", default=None)
    p.add_argument("--out", default="converted_params.npz")
    args = p.parse_args()

    import jax
    from mld_tpu.config import load_config
    from mld_tpu.models.mld import MLD
    from mld_tpu.utils.checkpoint import (
        load_reference_checkpoint,
        save_params_npz,
    )

    cfg = load_config(args.cfg, None, preset=args.preset)
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    converted = load_reference_checkpoint(args.ckpt, params)

    changed = [k for k in converted if k != "clip"]
    save_params_npz(args.out, converted)
    print(f"converted {args.ckpt} -> {args.out} (subtrees: {changed}; "
          "clip params are re-hydrated from the local HF clone at load)")


if __name__ == "__main__":
    main()

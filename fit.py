"""Joints -> SMPL pose/mesh fitting CLI.

Reference surface (fit.py:104-280): consume demo-generated joint npys,
produce fitted poses (+ mesh npy when the SMPL asset is available). The
per-frame LBFGS loop is replaced by one batched jitted optimization
(mld_tpu/transforms/fitting.py).

    python fit.py --dir results/demo
    python fit.py --files a.npy b.npy --smpl deps/smpl_models/smpl/SMPL_NEUTRAL.pkl
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", type=str, default=None,
                   help="directory of [T, J, 3] joint npys")
    p.add_argument("--files", type=str, nargs="*", default=None)
    p.add_argument("--smpl", type=str,
                   default="deps/smpl_models/smpl/SMPL_NEUTRAL.pkl")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--out_suffix", type=str, default="_fit")
    p.add_argument("--mesh", action="store_true",
                   help="also export vertices (needs SMPL asset)")
    args = p.parse_args()

    from mld_tpu.transforms.fitting import BatchedSMPLFitter

    files = list(args.files or [])
    if args.dir:
        files += sorted(glob.glob(os.path.join(args.dir, "*.npy")))
    files = [f for f in files if not f.endswith(
        (args.out_suffix + ".npy", "_mesh.npy"))]
    if not files:
        print("no input npys found")
        return

    fitter = BatchedSMPLFitter(args.smpl, num_steps=args.steps)
    if args.mesh and not fitter.smpl.has_asset:
        print("warning: SMPL asset missing — mesh export disabled")
        args.mesh = False

    for f in files:
        joints = np.load(f)
        if joints.ndim != 3 or joints.shape[-1] != 3:
            print(f"skip {f}: not a joints array {joints.shape}")
            continue
        res = fitter.fit(joints)
        stem = f[: -len(".npy")]
        np.savez(stem + args.out_suffix + ".npz", rot6d=res["rot6d"],
                 trans=res["trans"], joints_fit=res["joints_fit"])
        err = float(np.sqrt(res["loss_curve"][-1]))
        print(f"{os.path.basename(f)}: frames={len(joints)} "
              f"final_rmse~{err:.4f} -> {stem}{args.out_suffix}.npz")
        if args.mesh:
            verts = fitter.vertices(res["rot6d"], res["trans"])
            np.save(stem + "_mesh.npy", verts)
            print(f"  mesh: {verts.shape} -> {stem}_mesh.npy")


if __name__ == "__main__":
    main()

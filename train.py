"""Training CLI (reference train.py surface, TPU-native runtime).

    python train.py --cfg configs/mld_humanml3d.yaml
    python train.py --preset vae_humanml3d --nodebug
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description="train MLD (TPU-native)")
    p.add_argument("--cfg", type=str, default=None, help="config yaml")
    p.add_argument("--preset", type=str, default="mld_humanml3d",
                   help="capability preset (see mld_tpu.config.presets)")
    p.add_argument("--cfg_assets", type=str, default=None,
                   help="assets yaml overlay (paths)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--device", type=int, nargs="*", default=None,
                   help="device ids, reference-style (--device 0 1 2 3); "
                        "on TPU the ids select the mesh size — len(ids) "
                        "devices along the data axis (default: all)")
    p.add_argument("--nodebug", action="store_true")
    p.add_argument("--resume", type=str, default=None,
                   help="experiment dir to resume")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--stage", type=str, default=None,
                   choices=["vae", "diffusion", "vae_diffusion"])
    return p.parse_args()


def main():
    args = parse_args()
    from mld_tpu.config import load_config, merge_dicts
    from mld_tpu.train.loop import train

    overrides = {}
    if args.cfg_assets:
        import yaml
        with open(args.cfg_assets) as f:
            overrides = merge_dicts(overrides, yaml.safe_load(f) or {})
    if args.batch_size:
        overrides = merge_dicts(overrides,
                                {"train": {"batch_size": args.batch_size}})
    if args.stage:
        overrides = merge_dicts(overrides, {"train": {"stage": args.stage}})
    if args.device:
        overrides = merge_dicts(
            overrides, {"train": {"data_parallel": len(args.device)}})
    overrides["debug"] = not args.nodebug

    cfg = load_config(args.cfg, overrides, preset=args.preset)
    if args.resume:
        cfg = cfg.replace(name=os.path.basename(args.resume.rstrip("/")))
    train(cfg, max_steps=args.max_steps, resume=bool(args.resume))


if __name__ == "__main__":
    main()

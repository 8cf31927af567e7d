"""Evaluation CLI: full metric protocol with replications.

Reference surface (test.py:39-146): run the metric suite REPLICATION_TIMES
times, report mean ± 1.96*std/sqrt(n), write a results json + table.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description="evaluate MLD (TPU-native)")
    p.add_argument("--cfg", type=str, default=None)
    p.add_argument("--preset", type=str, default="mld_humanml3d")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--replication", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--stage", type=str, default=None,
                   choices=["vae", "diffusion"])
    p.add_argument("--no_mm", action="store_true")
    p.add_argument("--gt", action="store_true",
                   help="also run the ground-truth-only metric pass")
    p.add_argument("--save_predictions", action="store_true",
                   help="dump generated joints npys next to the results")
    p.add_argument("--out", type=str, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from mld_tpu.config import load_config, merge_dicts
    from mld_tpu.data.datamodule import get_datamodule
    from mld_tpu.eval.pipeline import Evaluator
    from mld_tpu.models.mld import MLD
    from mld_tpu.train.loop import _load_pretrained
    from mld_tpu.utils.logger import create_experiment_dir

    overrides = {"debug": False}
    if args.batch_size:
        overrides = merge_dicts(overrides,
                                {"eval": {"batch_size": args.batch_size}})
    if args.replication:
        overrides = merge_dicts(
            overrides, {"test": {"replication_times": args.replication}})
    cfg = load_config(args.cfg, overrides, preset=args.preset)
    stage = args.stage or cfg.train.stage
    if stage not in ("vae", "diffusion"):
        stage = "diffusion"

    mld = MLD(cfg)
    # action presets have no text tokenizer (mld.py:134-145)
    dm = get_datamodule(cfg, tokenizer=getattr(mld, "tokenizer", None))
    mld.mean = jnp.asarray(dm.mean, jnp.float32)
    mld.std = jnp.asarray(dm.std, jnp.float32)
    mld.mean_eval = jnp.asarray(dm.mean_eval, jnp.float32)
    mld.std_eval = jnp.asarray(dm.std_eval, jnp.float32)

    params = mld.init_params(jax.random.PRNGKey(0))
    ckpt = args.checkpoint or cfg.test.checkpoints
    if ckpt:
        params = _load_pretrained(ckpt, params)
        print(f"loaded checkpoint {ckpt}")

    prediction_sink = None
    if args.save_predictions or cfg.test.save_predictions:
        # dump the EXACT motions the metrics are computed on (reference
        # modeltype/base.py:184), not a fresh re-sample
        import numpy as np
        pred_dir = os.path.join(cfg.logger.folder, "mld", cfg.name,
                                "predictions")
        os.makedirs(pred_dir, exist_ok=True)
        counter = {"n": 0}

        def prediction_sink(joints, lengths):
            joints = np.asarray(joints)
            for i, L in enumerate(np.asarray(lengths)):
                np.save(os.path.join(pred_dir,
                                     f"pred_{counter['n']:05d}.npy"),
                        joints[i, : int(L)])
                counter["n"] += 1

    evaluator = Evaluator(cfg, mld, dm)
    results = evaluator.run(params, jax.random.PRNGKey(cfg.seed),
                            replication_times=cfg.test.replication_times,
                            stage=stage, with_mm=not args.no_mm,
                            prediction_sink=prediction_sink)
    if args.gt and not evaluator.is_a2m:
        gt = evaluator.run_gt(params, dm.loader("test", shuffle=False),
                              jax.random.PRNGKey(0))
        results.update({f"gt_only/{k}": float(v) for k, v in gt.items()})
    elif args.gt:
        print("--gt: separate GT-only pass is a t2m-protocol feature; "
              "the a2m protocol already folds GT statistics into the "
              "accumulator (gt_accuracy/FID columns above) — flag ignored")

    if prediction_sink is not None:
        print(f"saved {counter['n']} evaluated-prediction npys")

    exp_dir = create_experiment_dir(cfg.logger.folder, "mld", cfg.name,
                                    phase="test")
    out_path = args.out or os.path.join(exp_dir, "metrics_test.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)

    width = max(len(k) for k in results)
    print(f"\n{'metric'.ljust(width)}  value")
    for k in sorted(results):
        if k.endswith("/conf95"):
            continue
        conf = results.get(f"{k}/conf95", 0.0)
        print(f"{k.ljust(width)}  {results[k]:.4f} ± {conf:.4f}")
    print(f"\nresults written to {out_path}")


if __name__ == "__main__":
    main()

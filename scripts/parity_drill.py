"""One-command released-checkpoint parity drill.

Given the reference release assets at their canonical paths, this script
runs the full pipeline — convert -> shape-validate -> hydrate CLIP ->
replicated metric evaluation -> timing — and diffs the result against the
published numbers (BASELINE.md: HumanML3D FID 0.473, R@1 0.481, R@3 0.772,
MM-Dist 3.196, Diversity 9.724, AITS 0.217 s) with a pass/fail verdict at
the 5% budget.

Canonical asset layout (reference prepare/*.sh targets):
    models/mld_humanml3d_checkpoint/1222_mld_humanml3d_FID041.ckpt
    deps/clip-vit-large-patch14/            (HF clone)
    deps/glove/                             (our_vab GloVe + POS)
    deps/t2m/t2m/text_mot_match/model/finest.tar
    deps/t2m/t2m/Comp_v6_KLD01/meta/{mean,std}.npy
    datasets/humanml3d/                     (HumanML3D release)

    python scripts/parity_drill.py [--assets-root .] [--replications 20] \
        [--out drill_report.json]

The drill degrades explicitly: every missing asset is reported, and the
verdict is only meaningful when all assets are real. CI proves the
mechanics end-to-end on fabricated full-schema assets
(tests/test_parity_drill.py).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAPER_TARGETS = {
    "FID": 0.473,
    "R_precision_top_1": 0.481,
    "R_precision_top_3": 0.772,
    "Matching_score": 3.196,
    "Diversity": 9.724,
}
PAPER_AITS = 0.217  # s/motion, V100 (arXiv 2212.04048 Tab. 6)


def asset_paths(root: str, args) -> dict:
    j = os.path.join
    return {
        "ckpt": args.ckpt or j(root, "models", "mld_humanml3d_checkpoint",
                               "1222_mld_humanml3d_FID041.ckpt"),
        "clip": j(root, "deps", "clip-vit-large-patch14"),
        "glove": j(root, "deps", "glove"),
        "t2m_tar": j(root, "deps", "t2m", "t2m", "text_mot_match", "model",
                     "finest.tar"),
        "t2m_meta": j(root, "deps", "t2m", "t2m", "Comp_v6_KLD01", "meta"),
        "data": j(root, "datasets", "humanml3d"),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--assets-root", default=".")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--cfg", default=None,
                   help="config overrides yaml (CI uses tiny dims)")
    p.add_argument("--replications", type=int, default=20)
    p.add_argument("--budget", type=float, default=0.05)
    p.add_argument("--no-mm", action="store_true")
    p.add_argument("--skip-timing", action="store_true")
    p.add_argument("--out", default="drill_report.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from mld_tpu.config import load_config, merge_dicts
    from mld_tpu.data.datamodule import get_datamodule
    from mld_tpu.eval.pipeline import Evaluator
    from mld_tpu.models.mld import MLD, lengths_to_mask
    from mld_tpu.utils.checkpoint import load_reference_checkpoint

    root = args.assets_root
    paths = asset_paths(root, args)
    present = {k: os.path.exists(v) for k, v in paths.items()}
    print("== asset check ==")
    for k, v in paths.items():
        print(f"  [{'ok' if present[k] else 'MISSING'}] {k}: {v}")

    report = {"assets": {k: {"path": paths[k], "present": present[k]}
                         for k in paths},
              "budget": args.budget,
              "targets": PAPER_TARGETS,
              "steps": []}

    def step(name, ok, detail=""):
        report["steps"].append({"step": name, "ok": bool(ok),
                                "detail": detail})
        print(f"  [{'ok' if ok else 'FAIL'}] {name} {detail}")

    if not present["ckpt"] or not present["data"]:
        report["verdict"] = "blocked: missing checkpoint or dataset"
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"\nBLOCKED — fetch the release assets first "
              f"(see docstring). Report: {args.out}")
        sys.exit(2)

    overrides = {
        "debug": False,
        "dataset": {"root": paths["data"],
                    "word_vectorizer_path": paths["glove"]},
        "model": {"clip_path": paths["clip"],
                  "t2m_path": os.path.join(root, "deps", "t2m")},
        "test": {"replication_times": args.replications},
    }
    if args.cfg:
        import yaml
        with open(args.cfg) as f:
            overrides = merge_dicts(overrides, yaml.safe_load(f) or {})
    cfg = load_config(None, overrides, preset="mld_humanml3d")

    print("== build + convert ==")
    mld = MLD(cfg)
    step("tokenizer", True,
         "exact HF tokenizer" if mld.tokenizer.is_exact
         else "HASH FALLBACK (verdict not release-grade)")
    params = mld.init_params(jax.random.PRNGKey(0))

    try:
        params = load_reference_checkpoint(paths["ckpt"], params)
        step("convert+shape-validate", True, paths["ckpt"])
    except Exception as e:
        step("convert+shape-validate", False, str(e))
        report["verdict"] = f"fail: checkpoint conversion — {e}"
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        sys.exit(1)

    # hydrate CLIP from the local HF clone (released ckpts exclude CLIP,
    # modeltype/base.py:96-127)
    if present["clip"]:
        try:
            from mld_tpu.models.clip_text import load_hf_clip_weights
            params["clip"] = load_hf_clip_weights(paths["clip"])
            step("clip-hydrate", True)
        except Exception as e:
            step("clip-hydrate", False, str(e))
    else:
        step("clip-hydrate", False, "clip clone missing — random CLIP")

    dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
    mld.mean = jnp.asarray(dm.mean, jnp.float32)
    mld.std = jnp.asarray(dm.std, jnp.float32)
    mld.mean_eval = jnp.asarray(dm.mean_eval, jnp.float32)
    mld.std_eval = jnp.asarray(dm.std_eval, jnp.float32)
    step("t2m-eval-stats", present["t2m_meta"],
         "evaluator-space mean/std" if present["t2m_meta"]
         else "falling back to model stats")

    print(f"== evaluation ({args.replications} replications) ==")
    evaluator = Evaluator(cfg, mld, dm)
    results = evaluator.run(params, jax.random.PRNGKey(cfg.seed),
                            replication_times=args.replications,
                            stage="diffusion", with_mm=not args.no_mm)
    report["results"] = {k: float(v) for k, v in results.items()}

    if not args.skip_timing:
        B = 1  # AITS protocol: single-sample latency
        ids = jnp.asarray(mld.tokenizer(["a person walks forward"] * B))
        mask = lengths_to_mask(jnp.asarray([196] * B),
                               cfg.dataset.max_motion_len)
        out = mld.generate_joints(params, ids, mask, jax.random.PRNGKey(0))
        np.asarray(out[0, 0, 0])
        start = time.perf_counter()
        iters = 20
        for i in range(iters):
            out = mld.generate_joints(params, ids, mask,
                                      jax.random.PRNGKey(i))
        np.asarray(out[0, 0, 0])
        aits = (time.perf_counter() - start) / iters / B
        report["aits_sec"] = aits
        report["aits_vs_paper"] = PAPER_AITS / aits
        print(f"  AITS {aits * 1e3:.1f} ms/motion "
              f"({PAPER_AITS / aits:.1f}x paper V100)")

    print("== verdict ==")
    failures = []
    comparisons = {}
    for key, target in PAPER_TARGETS.items():
        ours = results.get(key)
        if ours is None:
            continue
        rel = abs(ours - target) / abs(target)
        ok = rel <= args.budget
        comparisons[key] = {"ours": float(ours), "target": target,
                            "rel_diff": round(rel, 4), "ok": ok}
        print(f"  {key:22s} ours={ours:.4f} target={target:.4f} "
              f"rel={rel * 100:.1f}% [{'ok' if ok else 'FAIL'}]")
        if not ok:
            failures.append(key)
    report["comparisons"] = comparisons
    report["verdict"] = ("pass" if not failures
                         else f"fail: {', '.join(failures)}")
    if not mld.tokenizer.is_exact:
        report["verdict"] += " (hash-tokenizer fallback — not release-grade)"

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nverdict: {report['verdict']}\nreport: {args.out}")
    sys.exit(0 if report["verdict"].startswith("pass") else 1)


if __name__ == "__main__":
    main()

"""Turn the per-stage precision study into an auditable serving-config
decision (VERDICT r4 task 1).

Reads docs/precision_report_r5.json (scripts/precision_study.py output,
base="highest" arms = f32 measuring stick) and decides the cheapest
serving precision config whose quality deltas stay inside the budget.

Method
------
1. Noise floor: the noise_seed* arms re-run the IDENTICAL numerics as
   "highest" with a different eval PRNG seed. For every metric, the max
   |relative delta| across those arms is the sampling-noise floor — a
   precision arm below that floor carries no quality signal (the DDIM
   iteration is chaotic w.r.t. any perturbation; see
   scripts/precision_study.py ARMS comment).
2. Budget: BASELINE.json's parity budget is 5% on FID/R-precision. An
   arm passes if, for each gating metric, |rel delta| <= max(noise
   floor, budget).
3. Ranking: candidate serving configs ordered by measured cost
   (bf16 "default" = 1 matmul pass, "high" = 3 passes, "highest" = 6;
   stage-time ratios measured in models/mld.py stage benches). The
   decision is the cheapest passing candidate.

The decision JSON (docs/precision_decision_r5.json) records every arm's
deltas, the floor, and the verdict so the shipped bench.py default
traces to committed evidence. Reference quality anchor:
/root/reference/mld/models/modeltype/mld.py:290-360 (the sampling path
whose outputs the budget protects).
"""
import argparse
import json
import os

GATING = ["FID", "Matching_score", "R_precision_top_1",
          "R_precision_top_2", "R_precision_top_3"]
# physical-unit secondary metrics (reported, not gating: they gate the
# reconstruction path, which serving precision also perturbs)
SECONDARY = ["APE_root", "APE_mean_joints", "AVE_root", "AVE_mean_joints"]
BUDGET = 0.05  # BASELINE.json: FID / R-precision within 5%

# candidate serving configs, cheapest first. (global precision,
# per-stage overlay) exactly as bench.py would ship them; `arm` is the
# study arm that measured the config with an f32 evaluator.
CANDIDATES = [
    ("gen_bf16", "default", ""),
    ("gen_fast", "default", "decode=high"),
    ("gen_mixed_high", "default", "scan=high,decode=high"),
    ("serving_mixed", "default", "scan=highest,decode=highest"),
    ("highest", "highest", ""),
]


def rel_deltas(arm: dict, base: dict, keys) -> dict:
    out = {}
    for k in keys:
        if k in arm and k in base:
            denom = max(abs(base[k]), 1e-6)
            out[k] = abs(arm[k] - base[k]) / denom
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--report", default="docs/precision_report_r5.json")
    p.add_argument("--out", default="docs/precision_decision_r5.json")
    p.add_argument("--budget", type=float, default=BUDGET)
    args = p.parse_args()

    with open(args.report) as f:
        report = json.load(f)
    base = report["highest"]
    noise_arms = sorted(k for k in report if k.startswith("noise_seed"))
    if not noise_arms:
        raise SystemExit("no noise_seed* arms in the report — the floor "
                         "is undefined; re-run scripts/precision_study.py "
                         "with the noise arms included")

    floor = {}
    for k in GATING + SECONDARY:
        ds = [rel_deltas(report[a], base, [k]).get(k) for a in noise_arms]
        ds = [d for d in ds if d is not None]
        if ds:
            floor[k] = max(ds)

    decision = {"report": os.path.abspath(args.report),
                "budget": args.budget,
                "noise_arms": noise_arms,
                "noise_floor": floor,
                "arms": {}, "chosen": None}

    chosen = None
    for arm, prec, spec in CANDIDATES:
        if arm not in report:
            continue
        deltas = rel_deltas(report[arm], base, GATING + SECONDARY)
        gates = {}
        for k in GATING:
            if k in deltas:
                allowed = max(floor.get(k, 0.0), args.budget)
                gates[k] = {"delta": deltas[k], "allowed": allowed,
                            "pass": deltas[k] <= allowed}
        ok = all(g["pass"] for g in gates.values())
        decision["arms"][arm] = {
            "serving_env": {"MLD_TPU_MATMUL_PRECISION": prec,
                            "MLD_TPU_STAGE_PRECISION": spec},
            "gates": gates,
            "secondary_deltas": {k: deltas[k] for k in SECONDARY
                                 if k in deltas},
            "passes": ok,
        }
        if ok and chosen is None:
            chosen = (arm, prec, spec)
        line = "PASS" if ok else "fail"
        worst = max((g["delta"] for g in gates.values()), default=0.0)
        print(f"{arm:16s} {line}  worst gating delta {worst*100:6.2f}%  "
              f"env: precision={prec} stage='{spec}'")

    if chosen is None:
        # nothing cheaper than all-f32 passes: ship "highest"
        chosen = ("highest", "highest", "")
    decision["chosen"] = {"arm": chosen[0],
                          "MLD_TPU_MATMUL_PRECISION": chosen[1],
                          "MLD_TPU_STAGE_PRECISION": chosen[2]}
    print(f"\nchosen: {chosen[0]} -> MLD_TPU_MATMUL_PRECISION={chosen[1]} "
          f"MLD_TPU_STAGE_PRECISION='{chosen[2]}'")
    with open(args.out, "w") as f:
        json.dump(decision, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Training-step throughput benchmark (flagship config, one chip).

Reference anchor: ~1 day for 2000 epochs of HumanML3D (~24.5k clips) at
batch 64 on one GPU (README.md:207) ≈ 8.9 optimizer steps/sec.

    python scripts/bench_train.py [--stage diffusion|vae] [--batch 64]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_STEPS_PER_SEC = 2000 * (24500 // 64) / (24 * 3600)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="diffusion",
                   choices=["vae", "diffusion"])
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--pipeline", action="store_true",
                   help="drive the REAL input pipeline (synthetic dataset, "
                        "loader + collate + host->device) instead of a "
                        "fixed device batch — measures host-boundness")
    p.add_argument("--no-prefetch", action="store_true",
                   help="with --pipeline: disable the background-thread "
                        "prefetch loader (A/B)")
    p.add_argument("--spd", type=int, default=1,
                   help="with --pipeline: optimizer steps fused per "
                        "dispatch (train.steps_per_dispatch)")
    p.add_argument("--device-data", action="store_true",
                   help="with --pipeline: corpus resident in HBM with "
                        "on-device sampling fused into the scan "
                        "(data/device_dataset.py) — no per-step H2D")
    p.add_argument("--ab", action="store_true",
                   help="with --pipeline: interleaved same-process A/B of "
                        "the device-data scan vs the fixed-batch scan — "
                        "immune to tunnel-session drift between runs")
    p.add_argument("--fixed-scan", action="store_true",
                   help="K-step lax.scan over a PRE-STAGED device "
                        "super-batch (no sampler, no loader): isolates "
                        "scan-structure cost vs K independent dispatches")
    p.add_argument("--data-root", default="/tmp/mld_bench_data2k")
    p.add_argument("--sweep", action="store_true",
                   help="stage x batch x matmul-precision sweep with "
                        "per-config steps/s, samples/s and MFU (fresh-trace "
                        "cost-analysis FLOPs of the train step, bf16-peak "
                        "denominator) -> one JSON report")
    p.add_argument("--out", default="bench_train_sweep.json",
                   help="with --sweep: report path")
    p.add_argument("--dropout", type=float, default=None,
                   help="override model dropout (A/B the attention-prob "
                        "dropout cost)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize forwards in the loss (A/B "
                        "activation traffic vs recompute)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training (model.dtype=bfloat16: "
                        "bf16 forwards, f32 masters/optimizer/loss)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mld_tpu.config import load_config
    from mld_tpu.models.mld import MLD
    from mld_tpu.train.steps import create_train_state, make_train_step

    over = {}
    if args.dropout is not None:
        over["model"] = {"dropout": args.dropout}
    if args.bf16:
        over.setdefault("model", {})["dtype"] = "bfloat16"
    if args.remat:
        over["train"] = {"remat": True}
    cfg = load_config(None, over or None, preset="mld_humanml3d")
    if args.sweep:
        return sweep_bench(args)
    if args.pipeline:
        return pipeline_bench(args, cfg)
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    state = create_train_state(mld, params, args.stage)
    step = make_train_step(mld, args.stage, donate=True)

    B, T = args.batch, cfg.dataset.max_motion_len
    rng_np = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rng_np.randn(B, T, cfg.dataset.nfeats),
                              jnp.float32),
        "mask": jnp.asarray(
            np.arange(T)[None] < rng_np.randint(64, T + 1, (B, 1))),
        "text_ids": jnp.asarray(mld.tokenizer(["a person walks"] * B)),
    }
    key = jax.random.PRNGKey(1)
    if args.fixed_scan:
        from mld_tpu.train.steps import make_train_scan
        K = max(args.spd, 2)
        batches = {k: jnp.broadcast_to(v, (K,) + v.shape)
                   for k, v in batch.items()}
        scan = make_train_scan(mld, args.stage, donate=True)
        state, logs = scan(state, batches, key)  # compile
        np.asarray(logs["total"])
        start = time.perf_counter()
        n = 0
        while n < args.iters:
            state, logs = scan(state, batches, jax.random.PRNGKey(n))
            n += K
        np.asarray(logs["total"])
        elapsed = time.perf_counter() - start
        steps_per_sec = n / elapsed
        print(json.dumps({
            "metric": f"{args.stage}_train_fixedscan_throughput",
            "value": round(steps_per_sec, 3),
            "unit": "steps/sec/chip", "batch_size": args.batch, "spd": K,
            "vs_baseline": round(steps_per_sec / REF_STEPS_PER_SEC, 3),
        }))
        return
    state, logs = step(state, batch, key)  # compile
    np.asarray(logs["total"])              # real barrier (tunneled platform)

    start = time.perf_counter()
    for i in range(args.iters):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
    np.asarray(logs["total"])
    elapsed = time.perf_counter() - start

    steps_per_sec = args.iters / elapsed
    print(json.dumps({
        "metric": f"{args.stage}_train_step_throughput",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec/chip",
        "batch_size": args.batch,
        "vs_baseline": round(steps_per_sec / REF_STEPS_PER_SEC, 3),
    }))


def pipeline_bench(args, cfg):
    """steps/sec through the REAL loop path: synthetic dataset on disk ->
    (Prefetch)DataLoader -> collate (native C++ when available) ->
    _device_batch -> jitted train step, logs kept device-side."""
    import subprocess
    import jax
    import jax.numpy as jnp

    if not os.path.exists(os.path.join(args.data_root, "Mean.npy")):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("PYTHONPATH", None)
        env["JAX_PLATFORMS"] = "cpu"
        code = ("import sys; sys.path.insert(0, %r); "
                "from mld_tpu.data.synthetic import build_synthetic_dataset;"
                " build_synthetic_dataset(%r, n_samples=2048, seed=0)" % (
                    os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), args.data_root))
        subprocess.run([sys.executable, "-c", code], env=env, check=True,
                       timeout=900)

    from mld_tpu.config import merge_dicts, load_config
    from mld_tpu.data.datamodule import get_datamodule
    from mld_tpu.models.mld import MLD
    from mld_tpu.train.loop import device_prefetch
    from mld_tpu.train.steps import (create_train_state, make_train_scan,
                                     make_train_step)

    over = {"dataset": {"root": args.data_root},
            "train": {"stage": args.stage, "batch_size": args.batch}}
    if args.bf16:
        over["model"] = {"dtype": "bfloat16"}
    cfg = load_config(None, over, preset="mld_humanml3d")
    mld = MLD(cfg)
    dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
    mld.mean = jnp.asarray(dm.mean, jnp.float32)
    mld.std = jnp.asarray(dm.std, jnp.float32)
    params = mld.init_params(jax.random.PRNGKey(0))
    state = create_train_state(mld, params, args.stage)
    spd = max(1, args.spd)

    if args.ab:
        return ab_bench(args, cfg, mld, dm, params, spd)

    if args.device_data:
        from mld_tpu.train.steps import make_device_train_scan
        dds = dm.device_dataset("train")
        dscan = make_device_train_scan(mld, args.stage, args.batch,
                                       donate=True)
        rng = jax.random.PRNGKey(1)
        state, logs = dscan(state, dds.arrays, rng, spd)  # compile
        np.asarray(logs["total"])
        start = time.perf_counter()
        n = 0
        while n < args.iters:
            rng, srng = jax.random.split(rng)
            state, logs = dscan(state, dds.arrays, srng, spd)
            n += spd
        np.asarray(logs["total"])
        elapsed = time.perf_counter() - start
        print(json.dumps({
            "metric": f"{args.stage}_train_devicedata_throughput",
            "value": round(n / elapsed, 3),
            "unit": "steps/sec/chip",
            "batch_size": args.batch, "spd": spd,
            "corpus_mb": round(dds.nbytes / 2**20, 1),
            "vs_baseline": round(n / elapsed / REF_STEPS_PER_SEC, 3),
        }))
        return

    step = make_train_step(mld, args.stage, donate=True)
    scan = make_train_scan(mld, args.stage, donate=True) if spd > 1 else None

    prefetch = 0 if args.no_prefetch else 3
    loader = dm.loader("train", drop_last=True, prefetch=prefetch)

    def run_epochs(n_steps):
        logs = None
        count = 0
        rng = jax.random.PRNGKey(1)
        while count < n_steps:
            for item in device_prefetch(loader, group=spd):
                rng, srng = jax.random.split(rng)
                if spd > 1:
                    kind, dbatch = item
                    if kind == "scan":
                        run_epochs.state, logs = scan(
                            run_epochs.state, dbatch, srng)
                        count += spd
                    else:
                        run_epochs.state, logs = step(
                            run_epochs.state, dbatch, srng)
                        count += 1
                else:
                    run_epochs.state, logs = step(run_epochs.state,
                                                  item, srng)
                    count += 1
                if count >= n_steps:
                    break
        np.asarray(logs["total"])  # barrier
        return count

    run_epochs.state = state
    # compile + warm BOTH programs (the scan and the epoch-tail single)
    run_epochs(max(2, 3 * spd + 3))
    start = time.perf_counter()
    n = run_epochs(args.iters)
    elapsed = time.perf_counter() - start
    steps_per_sec = n / elapsed
    print(json.dumps({
        "metric": f"{args.stage}_train_pipeline_throughput",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec/chip",
        "batch_size": args.batch,
        "prefetch": prefetch,
        "native_collate": dm.use_native,
        "vs_baseline": round(steps_per_sec / REF_STEPS_PER_SEC, 3),
    }))


def sweep_bench(args):
    """Training-throughput sweep (VERDICT r4 task 3): stage x batch x
    matmul-precision at K=8 steps/dispatch, plus a K=1 arm to expose the
    scan/dispatch structure. Per config: steps/s, samples/s, and MFU.

    MFU accounting rule (VERDICT r4 item 9): the numerator is XLA
    cost-analysis FLOPs of a FRESH trace of the full train step
    (fwd+bwd+optimizer, donate off so the lowering is re-usable), the
    denominator is the chip's PEAK BF16 rate regardless of the arm's
    matmul precision — so f32 ("highest", ~6 bf16 MXU passes per logical
    matmul) shows up as ~6x lower MFU for the same logical FLOPs, which
    is exactly the cost being measured.
    """
    import jax
    import jax.numpy as jnp
    from mld_tpu.config import load_config
    from mld_tpu.models.mld import MLD
    from mld_tpu.train.steps import (create_train_state, make_train_scan,
                                     make_train_step)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _peak_flops  # single source for the peak table

    peak = _peak_flops()
    report = {"device": jax.devices()[0].device_kind,
              "peak_bf16_tflops": peak / 1e12,
              "ref_anchor_steps_per_sec": REF_STEPS_PER_SEC,
              "arms": []}

    # Arm layout: the precision dimension is swept at the reference's
    # batch (64, matched-effective-batch comparison vs the 8.9 steps/s
    # anchor); the batch dimension is swept at bf16 "default" (the
    # candidate shipping config — quality evidence for bf16 TRAINING is
    # scripts/train_precision_study.py). The full 2x3x3 grid was
    # measured to be trace-bound on the 1-core host (~3-5 min/arm of
    # jaxpr tracing + HLO lowering per unique program, compile cache
    # notwithstanding), so the grid is pruned to the rows the decision
    # needs.
    arms = []
    for stage in ("vae", "diffusion"):
        for prec in ("highest", "high", "default"):
            arms.append((stage, 64, prec, 8))
        for B in (128, 256):
            arms.append((stage, B, "default", 8))
    arms.append(("vae", 64, "highest", 1))       # dispatch-bound anchor
    arms.append(("diffusion", 64, "highest", 1))

    cfg = load_config(None, None, preset="mld_humanml3d")
    mld = MLD(cfg)
    params0 = mld.init_params(jax.random.PRNGKey(0))
    rng_np = np.random.RandomState(0)
    T = cfg.dataset.max_motion_len

    for stage, B, prec, K in arms:
        jax.config.update("jax_default_matmul_precision", prec)
        try:
            batch = {
                "motion": jnp.asarray(rng_np.randn(B, T, cfg.dataset.nfeats),
                                      jnp.float32),
                "mask": jnp.asarray(
                    np.arange(T)[None] < rng_np.randint(64, T + 1, (B, 1))),
                "text_ids": jnp.asarray(mld.tokenizer(["a person walks"] * B)),
            }
            params = jax.tree_util.tree_map(jnp.copy, params0)
            state = create_train_state(mld, params, stage)

            # ONE trace per arm: AOT-lower the program that is actually
            # timed and take FLOPs from ITS cost analysis (the scan
            # program counts K steps -> divide by K). The previous
            # two-trace scheme (a second donate-off single-step program
            # just for cost analysis) doubled the dominant cost on the
            # 1-core host — the flagship fwd+bwd trace+lowering takes
            # minutes; the compiled-program numbers are identical
            # because the scan body IS the train step.
            flops = None
            iters = max(32, 4 * K)
            if K > 1:
                scan = make_train_scan(mld, stage, donate=True)
                batches = {k: jnp.broadcast_to(v, (K,) + v.shape)
                           for k, v in batch.items()}
                compiled = scan.lower(state, batches,
                                      jax.random.PRNGKey(1)).compile()
                try:
                    cost = compiled.cost_analysis()
                    if isinstance(cost, list):
                        cost = cost[0]
                    flops = (float(cost.get("flops", 0.0)) or None)
                    if flops:
                        flops /= K
                except Exception:
                    pass
                state, logs = compiled(state, batches, jax.random.PRNGKey(1))
                np.asarray(logs["total"])  # compile barrier
                start = time.perf_counter()
                n = 0
                while n < iters:
                    state, logs = compiled(state, batches,
                                           jax.random.PRNGKey(n))
                    n += K
                np.asarray(logs["total"])
                elapsed = time.perf_counter() - start
            else:
                step = make_train_step(mld, stage, donate=True)
                compiled = step.lower(state, batch,
                                      jax.random.PRNGKey(1)).compile()
                try:
                    cost = compiled.cost_analysis()
                    if isinstance(cost, list):
                        cost = cost[0]
                    flops = float(cost.get("flops", 0.0)) or None
                except Exception:
                    pass
                state, logs = compiled(state, batch, jax.random.PRNGKey(1))
                np.asarray(logs["total"])
                start = time.perf_counter()
                n = iters
                for i in range(iters):
                    state, logs = compiled(state, batch,
                                           jax.random.PRNGKey(i))
                np.asarray(logs["total"])
                elapsed = time.perf_counter() - start

            sps = n / elapsed
            arm = {"stage": stage, "batch": B, "precision": prec, "spd": K,
                   "steps_per_sec": round(sps, 3),
                   "samples_per_sec": round(sps * B, 1),
                   "vs_baseline": round(sps / REF_STEPS_PER_SEC, 3)}
            if flops:
                arm["gflops_per_step"] = round(flops / 1e9, 2)
                arm["mfu_bf16peak"] = round(flops * sps / peak, 4)
            report["arms"].append(arm)
            print(json.dumps(arm), flush=True)
            with open(args.out, "w") as f:  # survive a timeout mid-sweep
                json.dump(report, f, indent=2)
            del state, batch, params
        finally:
            jax.config.update("jax_default_matmul_precision",
                              os.environ.get("MLD_TPU_MATMUL_PRECISION",
                                             "highest"))

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}", flush=True)


def ab_bench(args, cfg, mld, dm, params, spd):
    """Interleaved same-process A/B: device-data sampling scan vs the same
    K-step scan over a pre-staged fixed super-batch. Alternating timed
    segments make the comparison immune to the tunnel-session throughput
    drift that makes separate runs incomparable (measured swings of ~40%
    between sessions minutes apart)."""
    import jax
    import jax.numpy as jnp
    from mld_tpu.train.steps import (create_train_state,
                                     make_device_train_scan,
                                     make_train_scan)

    dds = dm.device_dataset("train")
    B, T = args.batch, cfg.dataset.max_motion_len
    rng_np = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rng_np.randn(B, T, cfg.dataset.nfeats),
                              jnp.float32),
        "mask": jnp.asarray(
            np.arange(T)[None] < rng_np.randint(64, T + 1, (B, 1))),
        "text_ids": jnp.asarray(mld.tokenizer(["a person walks"] * B)),
    }
    batches = {k: jnp.broadcast_to(v, (spd,) + v.shape)
               for k, v in batch.items()}

    # each arm gets its own param buffers: the states donate on every
    # dispatch, and a shared pytree would be deleted under the other arm
    state_a = create_train_state(
        mld, jax.tree_util.tree_map(jnp.copy, params), args.stage)
    state_b = create_train_state(
        mld, jax.tree_util.tree_map(jnp.copy, params), args.stage)
    dscan = make_device_train_scan(mld, args.stage, B, donate=True)
    fscan = make_train_scan(mld, args.stage, donate=True)

    def block(logs):
        np.asarray(logs["total"])

    rng = jax.random.PRNGKey(1)
    state_a, logs = dscan(state_a, dds.arrays, rng, spd)   # compile A
    block(logs)
    state_b, logs = fscan(state_b, batches, rng)           # compile B
    block(logs)

    m = max(1, args.iters // (4 * spd))  # dispatches per timed segment
    seg_a, seg_b = [], []
    for rep in range(6):
        for arm in ("a", "b"):
            t0 = time.perf_counter()
            for i in range(m):
                rng, srng = jax.random.split(rng)
                if arm == "a":
                    state_a, logs = dscan(state_a, dds.arrays, srng, spd)
                else:
                    state_b, logs = fscan(state_b, batches, srng)
            block(logs)
            dt = time.perf_counter() - t0
            (seg_a if arm == "a" else seg_b).append(m * spd / dt)
    med_a, med_b = float(np.median(seg_a)), float(np.median(seg_b))
    print(json.dumps({
        "metric": f"{args.stage}_train_ab_devicedata_vs_fixedscan",
        "device_data_steps_per_sec": round(med_a, 3),
        "fixed_scan_steps_per_sec": round(med_b, 3),
        "ratio": round(med_a / med_b, 4),
        "segments_device": [round(x, 2) for x in seg_a],
        "segments_fixed": [round(x, 2) for x in seg_b],
        "batch_size": args.batch, "spd": spd,
        "unit": "steps/sec/chip",
        "vs_baseline": round(med_a / REF_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

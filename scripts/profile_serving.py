"""Capture a jax.profiler trace of serving-stage programs and print the
top device ops by self-time.

The slope-based stage bench (bench_stages.py) showed the XLA VAE decode
and feats2joints stages running far above their rooflines (33ms / 14ms at
B=128 where the FLOP/byte budgets say ~1ms); this tool shows WHERE the
time goes inside the compiled program: it parses the Chrome-trace JSON
that jax.profiler emits and aggregates device-lane events by op name.

    python scripts/profile_serving.py --stage decode --batch 128
    python scripts/profile_serving.py --stage ric --batch 128
    python scripts/profile_serving.py --stage total --batch 128
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_trace(trace_dir, top=30):
    """Aggregate device-lane complete events by name from the newest
    trace.json.gz under trace_dir."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: process named like "/device:TPU:0" or containing "TPU"
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n.upper() or "device" in n.lower()}
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0)  # microseconds
        agg[name] += dur
        total += dur
    rows = agg.most_common(top)
    return rows, total, pid_names


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="decode",
                   choices=["decode", "ric", "clip", "scan", "total"])
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--keep", default=None,
                   help="keep the trace under this dir (default: tmp)")
    args = p.parse_args()

    os.environ.setdefault("MLD_TPU_MATMUL_PRECISION", "default")
    import jax
    import jax.numpy as jnp
    from mld_tpu.config import load_config
    from mld_tpu.models.mld import MLD, lengths_to_mask

    cfg = load_config(preset="mld_humanml3d")
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    B, T = args.batch, mld.max_frames
    rs = np.random.RandomState(0)
    lengths = jnp.asarray(rs.randint(40, T + 1, B))
    mask = lengths_to_mask(lengths, T)
    token_ids = mld.tokenize(
        ["a person walks forward and waves both hands"] * B)
    rng = jax.random.PRNGKey(7)

    if args.stage == "decode":
        z = jnp.asarray(rs.randn(B, cfg.model.latent_size,
                                 cfg.model.latent_dim), jnp.float32)
        fn = jax.jit(lambda p_, z_, m: mld.decode_latent(p_, z_, m))
        fargs = (params, z, mask)
    elif args.stage == "ric":
        feats = jnp.asarray(rs.randn(B, T, mld.nfeats), jnp.float32)
        fn = jax.jit(
            lambda f_, m: mld.feats2joints(f_) * m[..., None, None])
        fargs = (feats, mask)
    elif args.stage == "clip":
        fn = jax.jit(lambda p_, ids: mld.encode_text_tokens(p_, ids))
        fargs = (params, token_ids)
    elif args.stage == "scan":
        cond = jnp.asarray(rs.randn(2 * B, 1, 768), jnp.float32)
        fn = jax.jit(
            lambda p_, c, m, r: mld.diffusion_reverse(p_, c, m, r))
        fargs = (params, cond, mask, rng)
    else:
        fn = jax.jit(
            lambda p_, ids, m, r: mld.generate_joints(p_, ids, m, r))
        fargs = (params, token_ids, mask, rng)

    out = fn(*fargs)  # compile
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]

    trace_dir = args.keep or tempfile.mkdtemp(prefix="mld_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            out = fn(*fargs)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]

    rows, total, pid_names = parse_trace(trace_dir, args.top)
    print(json.dumps({"stage": args.stage, "batch": B,
                      "iters": args.iters,
                      "device_total_ms": round(total / 1e3, 3),
                      "per_iter_ms": round(total / 1e3 / args.iters, 3)},
                     indent=2))
    print(f"{'us_total':>12}  {'us/iter':>10}  op")
    for name, dur in rows:
        print(f"{dur:12.0f}  {dur / args.iters:10.1f}  {name[:110]}")
    if not args.keep:
        print(f"(trace kept at {trace_dir})")


if __name__ == "__main__":
    main()

"""Op-level profile diff: device-data train scan vs fixed-batch scan.

The device-resident corpus scan runs ~25% slower per optimizer step than
the same K-step scan over a pre-staged super-batch
(scripts/bench_train.py --fixed-scan vs --device-data), while the sampler
alone costs ~12 us/step (docs/bench_sampler_r4.json). This captures a
jax.profiler trace of one dispatch of each program and prints the top
self-time ops per arm so the difference can be attributed.

    python scripts/profile_train.py [--k 8] [--batch 64] [--top 25]
"""
import argparse
import glob
import gzip
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(tag, fn, *args):
    import jax

    out_dir = f"/tmp/mld_profile_{tag}"
    os.makedirs(out_dir, exist_ok=True)
    # warm (compile) outside the trace
    res = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(res)[0])
    with jax.profiler.trace(out_dir):
        res = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(res)[0])
    return out_dir


def _fields(buf):
    """Iterate (field_no, wire_type, value) over one protobuf message."""
    i, n = 0, len(buf)
    while i < n:
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        fno, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                val |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield fno, wt, val
        elif wt == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield fno, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fno, wt, buf[i:i + 4]
            i += 4
        elif wt == 1:
            yield fno, wt, buf[i:i + 8]
            i += 8
        else:  # pragma: no cover
            raise ValueError(f"wire type {wt}")


def xplane_op_times(out_dir, line_name=b"XLA Ops"):
    """Sum per-op durations (us) on the TPU plane's XLA-Ops line.

    Minimal hand-rolled xplane.pb reader (the installed
    tensorboard_plugin_profile's generated protos are incompatible with
    the environment's protobuf). Schema: XSpace.planes=1; XPlane{name=2,
    lines=3, event_metadata=4 (map: key=1, value=2 XEventMetadata{id=1,
    name=2})}; XLine{name=2, events=4}; XEvent{metadata_id=1,
    duration_ps=3}."""
    paths = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return {}
    raw = open(paths[-1], "rb").read()
    try:
        raw = gzip.decompress(raw)
    except OSError:
        pass
    times = defaultdict(float)
    for fno, wt, plane in _fields(memoryview(raw)):
        if fno != 1 or wt != 2:
            continue
        name = b""
        metas = {}
        lines = []
        for pf, pw, pv in _fields(plane):
            if pf == 2 and pw == 2:
                name = bytes(pv)
            elif pf == 3 and pw == 2:
                lines.append(pv)
            elif pf == 4 and pw == 2:  # event_metadata map entry
                mid, mname = None, b"?"
                for ef, ew, evv in _fields(pv):
                    if ef == 1 and ew == 0:
                        mid = evv
                    elif ef == 2 and ew == 2:  # XEventMetadata
                        for mf, mw, mv in _fields(evv):
                            if mf == 1 and mw == 0:
                                mid = mv
                            elif mf == 2 and mw == 2:
                                mname = bytes(mv)
                metas[mid] = mname.decode("utf-8", "replace")
        if b"TPU" not in name and b"/device:" not in name:
            continue
        for line in lines:
            lname = b""
            events = []
            for lf, lw, lv in _fields(line):
                if lf == 2 and lw == 2:
                    lname = bytes(lv)
                elif lf == 4 and lw == 2:
                    events.append(lv)
            if line_name and lname != line_name:
                continue
            for ev in events:
                mid, dur = None, 0
                for ef, ew, evv in _fields(ev):
                    if ef == 1 and ew == 0:
                        mid = evv
                    elif ef == 3 and ew == 0:
                        dur = evv
                times[metas.get(mid, "?")] += dur / 1e6  # ps -> us
    return dict(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--stage", default="vae")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--data-root", default="/tmp/mld_bench_data2k")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mld_tpu.config import load_config
    from mld_tpu.data.datamodule import get_datamodule
    from mld_tpu.models.mld import MLD
    from mld_tpu.train.steps import (create_train_state,
                                     make_device_train_scan,
                                     make_train_scan)

    cfg = load_config(None, {"dataset": {"root": args.data_root},
                             "train": {"stage": args.stage,
                                       "batch_size": args.batch}},
                      preset="mld_humanml3d")
    mld = MLD(cfg)
    dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
    mld.mean = jnp.asarray(dm.mean, jnp.float32)
    mld.std = jnp.asarray(dm.std, jnp.float32)
    params = mld.init_params(jax.random.PRNGKey(0))

    B, T, K = args.batch, cfg.dataset.max_motion_len, args.k
    rng_np = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rng_np.randn(B, T, cfg.dataset.nfeats),
                              jnp.float32),
        "mask": jnp.asarray(
            np.arange(T)[None] < rng_np.randint(64, T + 1, (B, 1))),
        "text_ids": jnp.asarray(mld.tokenizer(["a person walks"] * B)),
    }
    batches = {k_: jnp.broadcast_to(v, (K,) + v.shape)
               for k_, v in batch.items()}

    key = jax.random.PRNGKey(1)

    state_a = create_train_state(mld, params, args.stage)
    fixed = make_train_scan(mld, args.stage, donate=False)
    dir_a = capture("fixed", lambda: fixed(state_a, batches, key))

    dds = dm.device_dataset("train")
    state_b = create_train_state(mld, params, args.stage)
    dev = make_device_train_scan(mld, args.stage, B, donate=False)
    dir_b = capture("device", lambda: dev(state_b, dds.arrays, key, K))

    ta = xplane_op_times(dir_a)
    tb = xplane_op_times(dir_b)
    total_a, total_b = sum(ta.values()), sum(tb.values())
    print(f"\ntotal device-op self time: fixed={total_a/1e3:.2f} ms  "
          f"device={total_b/1e3:.2f} ms  (K={K}, per-step delta "
          f"{(total_b-total_a)/K/1e3:.2f} ms)\n")
    all_ops = sorted(set(ta) | set(tb),
                     key=lambda n: tb.get(n, 0.0) - ta.get(n, 0.0),
                     reverse=True)
    print(f"{'op':60s} {'fixed_us':>10s} {'device_us':>10s} {'delta':>10s}")
    for name in all_ops[:args.top]:
        a, b = ta.get(name, 0.0), tb.get(name, 0.0)
        print(f"{name[:60]:60s} {a:10.0f} {b:10.0f} {b-a:10.0f}")


if __name__ == "__main__":
    main()

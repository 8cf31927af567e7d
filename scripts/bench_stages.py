"""Per-stage time breakdown of the serving sampler on the real chip.

Splits the one-program `generate_joints` pipeline (models/mld.py:363-373;
reference loop mld.py:216-346) into its four stages and times each as an
isolated jitted program with in-graph chaining:

  1. CLIP text tower (uncond row + B prompt rows)
  2. 50-step DDIM scan (denoiser + CFG + scheduler step)
  3. VAE decode (latent -> [B, T, 263])
  4. feats2joints (de-norm + recover_from_ric cumsum) + masking

plus the fused total, so per-stage shares and the fusion overlap are both
visible. This is the roofline evidence VERDICT r2 task 4 asks for.

    python scripts/bench_stages.py [--batch 128] [--json docs/bench_stages_r3.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # host transfer = real completion barrier: on the tunneled platform
    # block_until_ready does not block (same caveat as bench.py)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def _time_chained(make_chained, args_, iters, chains=(4, 20)):
    """Per-iteration cost of a stage, dispatch-overhead-free.

    make_chained(n) must return a jittable fn running n in-graph
    iterations. The tunnel adds a large per-dispatch constant that even
    chained timing can't amortize cleanly, so measure at two chain
    lengths and take the slope: t(n) = overhead + n*cost.
    """
    lo, hi = chains
    per_dispatch = {}
    for n in (lo, hi):
        cfn = jax.jit(make_chained(n))
        _sync(cfn(*args_))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = cfn(*args_)
        _sync(out)
        per_dispatch[n] = (time.perf_counter() - t0) / iters
    return (per_dispatch[hi] - per_dispatch[lo]) / (hi - lo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--chain", type=int, default=10,
                   help="in-graph iterations per dispatch (amortizes the "
                        "tunnel's dispatch latency out of stage shares)")
    p.add_argument("--preset", default="mld_humanml3d")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    # shipped serving config (bench.py): all-bf16 matmul passes, no
    # per-stage f32 pin — decided by docs/precision_decision_r5.json
    # (every bf16 arm within 0.2% FID of f32; scripts/precision_decide.py)
    os.environ.setdefault("MLD_TPU_MATMUL_PRECISION", "default")
    os.environ.setdefault("MLD_TPU_STAGE_PRECISION", "")
    from mld_tpu.config import load_config
    from mld_tpu.models.mld import MLD, lengths_to_mask

    cfg = load_config(preset=args.preset)
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))

    B, T = args.batch, mld.max_frames
    rs = np.random.RandomState(0)
    lengths = jnp.asarray(rs.randint(40, T + 1, B))
    mask = lengths_to_mask(lengths, T)
    prompts = ["a person walks forward and waves both hands"] * B
    token_ids = mld.tokenize(prompts)
    rng = jax.random.PRNGKey(7)

    # ---- stage programs ----
    def clip_stage(p_, ids):
        un = mld.encode_text_tokens(p_, mld.uncond_ids)
        un = jnp.broadcast_to(un, (B,) + un.shape[1:])
        return jnp.concatenate([un, mld.encode_text_tokens(p_, ids)], 0)

    cond_emb = jax.jit(clip_stage)(params, token_ids)

    def scan_stage(p_, ce, m, r):
        return mld.diffusion_reverse(p_, ce, m, r)

    z = jax.jit(scan_stage)(params, cond_emb, mask, rng)

    def decode_stage(p_, z_, m):
        return mld.decode_latent(p_, z_, m)

    feats = jax.jit(decode_stage)(params, z, mask)

    def ric_stage(f_, m):
        return mld.feats2joints(f_) * m[..., None, None]

    def total(p_, ids, m, r):
        return mld.generate_joints(p_, ids, m, r)

    it = args.iters
    chains = (args.chain, 5 * args.chain)

    # each chained body feeds a zero-valued function of the previous
    # output back into an input, forcing sequential execution without
    # changing the math (CSE can't collapse the iterations)
    def chain_clip(n):
        def fn(p_, ids):
            def body(_, acc):
                zero = (jnp.sum(acc) * 0).astype(ids.dtype)
                return clip_stage(p_, ids + zero)
            return jax.lax.fori_loop(0, n, body, jnp.zeros_like(cond_emb))
        return fn

    def chain_scan(n):
        def fn(p_, ce, m, r):
            def body(_, acc):
                return scan_stage(p_, ce + 1e-20 * jnp.sum(acc), m, r)
            return jax.lax.fori_loop(0, n, body, jnp.zeros_like(z))
        return fn

    def chain_dec(n):
        def fn(p_, z_, m):
            def body(_, acc):
                return decode_stage(
                    p_, z_ + 1e-20 * acc[:, :1, :z_.shape[-1]], m)
            return jax.lax.fori_loop(
                0, n, body, jnp.zeros((B, T, mld.nfeats), jnp.float32))
        return fn

    def chain_ric(n):
        def fn(f_, m):
            def body(_, acc):
                return ric_stage(f_ + 1e-20 * jnp.sum(acc), m)
            return jax.lax.fori_loop(
                0, n, body,
                jnp.zeros((B, T, mld.njoints, 3), jnp.float32))
        return fn

    def chain_tot(n):
        def fn(p_, ids, m, r):
            def body(_, acc):
                zero = (jnp.sum(acc) * 0).astype(ids.dtype)
                return total(p_, ids + zero, m, r)
            return jax.lax.fori_loop(
                0, n, body,
                jnp.zeros((B, T, mld.njoints, 3), jnp.float32))
        return fn

    t_clip = _time_chained(chain_clip, (params, token_ids), it, chains)
    t_scan = _time_chained(chain_scan, (params, cond_emb, mask, rng), it,
                           chains)
    t_dec = _time_chained(chain_dec, (params, z, mask), it, chains)
    t_ric = _time_chained(chain_ric, (feats, mask), it, chains)
    t_tot = _time_chained(chain_tot, (params, token_ids, mask, rng), it,
                          chains)

    stages = {"clip": t_clip, "ddim50_scan": t_scan, "vae_decode": t_dec,
              "feats2joints": t_ric}
    ssum = sum(stages.values())
    report = {
        "device": jax.devices()[0].device_kind,
        "batch": B,
        "precision": os.environ.get("MLD_TPU_MATMUL_PRECISION"),
        "stage_precision": os.environ.get("MLD_TPU_STAGE_PRECISION"),
        "fused_denoiser": os.environ.get("MLD_TPU_FUSED_DENOISER", "auto"),
        "fused_decode": os.environ.get("MLD_TPU_FUSED_DECODE", "auto"),
        "stages_ms": {k: round(v * 1e3, 3) for k, v in stages.items()},
        "stage_share": {k: round(v / ssum, 4) for k, v in stages.items()},
        "stage_sum_ms": round(ssum * 1e3, 3),
        "total_ms": round(t_tot * 1e3, 3),
        "fusion_gain_ms": round((ssum - t_tot) * 1e3, 3),
        "motions_per_sec_total": round(B / t_tot, 1),
        "per_scan_step_us": round(t_scan * 1e6 / 50, 2),
    }
    print(json.dumps(report, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

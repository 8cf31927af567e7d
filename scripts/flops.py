"""FLOPs / cost analysis for the MLD pipeline.

Reference equivalent: scripts/flops.py:40-135 (thop/fvcore profiling).
TPU-native version: XLA's own cost analysis on the compiled programs —
exact for the real executed graph, no module hooks needed.

    python scripts/flops.py [--preset mld_humanml3d] [--batch 1]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def analyze(fn, *args) -> dict:
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed",
                                         cost.get("bytes_accessed", 0.0))),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="mld_humanml3d")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--length", type=int, default=196)
    args = p.parse_args()

    from mld_tpu.config import load_config
    from mld_tpu.models.mld import MLD, lengths_to_mask

    cfg = load_config(preset=args.preset)
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))

    B, T = args.batch, cfg.dataset.max_motion_len
    token_ids = jnp.zeros((B, 77), jnp.int32)
    mask = lengths_to_mask(jnp.full((B,), min(args.length, T)), T)
    rng = jax.random.PRNGKey(0)

    report = {}

    # full text->motion program
    report["generate_feats"] = analyze(
        lambda p_, ids, m, r: mld._generate_impl(p_, ids, m, r),
        params, token_ids, mask, rng)

    # single denoiser step (the per-DDIM-iteration cost)
    sample = jnp.zeros((B, mld.latent_size, mld.latent_dim))
    cond = jnp.zeros((2 * B if mld.do_cfg else B, 1,
                      cfg.model.text_encoded_dim))
    model_in = jnp.concatenate([sample, sample]) if mld.do_cfg else sample
    report["denoiser_step"] = analyze(
        lambda p_, s, c: mld.denoise(p_, s, jnp.asarray(500), c),
        params, model_in, cond)

    if mld.is_vae:
        feats = jnp.zeros((B, T, cfg.dataset.nfeats))
        report["vae_encode"] = analyze(
            lambda p_, f, m: mld.encode_motion(p_, f, m)[0],
            params, feats, mask)
        z = jnp.zeros((B, mld.latent_size, mld.latent_dim))
        report["vae_decode"] = analyze(
            lambda p_, z_, m: mld.decode_latent(p_, z_, m), params, z, mask)

    if mld.clip is not None:
        report["clip_text"] = analyze(
            lambda p_, ids: mld.encode_text_tokens(p_, ids),
            params, token_ids)

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    report["param_count"] = n_params
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

"""Latent-trajectory visualization across denoising steps.

Reference equivalent: scripts/tsne.py:30-104 (sklearn t-SNE over
`_diffusion_reverse_tsne` latents). Self-contained here: the per-step
latents come from a scan that stacks every intermediate state, embedded with
PCA or a small Barnes-Hut-free t-SNE (no sklearn in the image).

    python scripts/tsne.py --preset mld_humanml3d --out tsne.png
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def diffusion_reverse_trajectory(mld, params, cond_emb, mask, rng):
    """Like MLD.diffusion_reverse but stacks latents at every step
    (mld.py:362-424 `_diffusion_reverse_tsne` parity)."""
    B = cond_emb.shape[0] // 2 if mld.do_cfg else cond_emb.shape[0]
    rng, init_rng = jax.random.split(rng)
    latents = mld._init_latents(init_rng, B, mask)
    timesteps = jnp.asarray(mld.scheduler.timesteps())
    rngs = jax.random.split(rng, timesteps.shape[0])

    def body(latents, inp):
        t, srng = inp
        model_in = (jnp.concatenate([latents, latents], 0) if mld.do_cfg
                    else latents)
        out = mld.denoise(params, model_in, t, cond_emb)
        if mld.do_cfg:
            u, c = jnp.split(out, 2, axis=0)
            out = u + mld.guidance_scale * (c - u)
        latents = mld.scheduler.step(out, t, latents)
        return latents, latents

    _, traj = jax.lax.scan(body, latents, (timesteps, rngs))
    return traj  # [steps, B, latent_size, latent_dim]


def pca_2d(x: np.ndarray) -> np.ndarray:
    x = x - x.mean(0)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:2].T


def tsne_2d(x: np.ndarray, perplexity=15.0, iters=400, lr=100.0,
            seed=0) -> np.ndarray:
    """Compact exact t-SNE (O(n^2)) — fine for a few hundred latents."""
    n = x.shape[0]
    rng = np.random.RandomState(seed)
    d2 = np.sum((x[:, None] - x[None]) ** 2, -1)

    # binary-search per-point precision for the target perplexity
    P = np.zeros((n, n))
    target = np.log(perplexity)
    for i in range(n):
        lo, hi, beta = 1e-20, 1e20, 1.0
        di = np.delete(d2[i], i)
        for _ in range(40):
            p = np.exp(-di * beta)
            s = p.sum() + 1e-12
            H = np.log(s) + beta * (di * p).sum() / s
            if H > target:
                lo = beta
                beta = beta * 2 if hi > 1e19 else (beta + hi) / 2
            else:
                hi = beta
                beta = (beta + lo) / 2
        row = np.exp(-d2[i] * beta)
        row[i] = 0
        P[i] = row / (row.sum() + 1e-12)
    P = (P + P.T) / (2 * n)
    P = np.maximum(P, 1e-12)

    y = 1e-4 * rng.randn(n, 2)
    vel = np.zeros_like(y)
    for it in range(iters):
        yd2 = np.sum((y[:, None] - y[None]) ** 2, -1)
        num = 1.0 / (1.0 + yd2)
        np.fill_diagonal(num, 0)
        Q = np.maximum(num / num.sum(), 1e-12)
        PQ = (P - Q) * num
        grad = 4 * ((np.diag(PQ.sum(1)) - PQ) @ y)
        momentum = 0.5 if it < 100 else 0.8
        vel = momentum * vel - lr * grad
        y = y + vel
        y = y - y.mean(0)
    return y


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="mld_humanml3d")
    p.add_argument("--texts", nargs="*", default=[
        "a person walks forward", "a person jumps",
        "someone sits down", "a person waves"])
    p.add_argument("--out", default="tsne_latents.png")
    p.add_argument("--method", choices=["pca", "tsne"], default="tsne")
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args()

    from mld_tpu.config import load_config
    from mld_tpu.models.mld import MLD, lengths_to_mask
    from mld_tpu.train.loop import _load_pretrained

    cfg = load_config(preset=args.preset)
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    if args.checkpoint:
        params = _load_pretrained(args.checkpoint, params)

    B = len(args.texts)
    T = cfg.dataset.max_motion_len
    mask = lengths_to_mask(jnp.full((B,), T), T)
    ids = jnp.asarray(mld.tokenizer(args.texts))
    # full-context uncond row (mld.uncond_ids is EOT-cropped for serving
    # and cannot concatenate with 77-token ids)
    uncond = jnp.broadcast_to(jnp.asarray(mld.tokenizer([""])), ids.shape)
    cond = mld.encode_text_tokens(params, jnp.concatenate([uncond, ids])
                                  if mld.do_cfg else ids)
    traj = diffusion_reverse_trajectory(mld, params, cond, mask,
                                        jax.random.PRNGKey(0))
    traj = np.asarray(traj)  # [steps, B, 1, D]
    S = traj.shape[0]
    flat = traj.reshape(S * B, -1)
    emb = pca_2d(flat) if args.method == "pca" else tsne_2d(flat)
    emb = emb.reshape(S, B, 2)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 6))
    for b in range(B):
        ax.plot(emb[:, b, 0], emb[:, b, 1], "-o", markersize=2,
                alpha=0.7, label=args.texts[b][:30])
        ax.scatter(emb[-1, b, 0], emb[-1, b, 1], marker="*", s=120)
    ax.legend(fontsize=7)
    ax.set_title(f"latent denoising trajectories ({args.method})")
    fig.savefig(args.out, dpi=120)
    print(f"saved {args.out}  trajectories={traj.shape}")


if __name__ == "__main__":
    main()
